"""The driver contract of bench.py: whatever happens, the LAST stdout
line is parseable JSON with the headline metric — round 4's record was
lost to a wedged backend (rc=1, nothing parseable), which is the
failure class these tests pin. CPU-only; no model compiles."""

import json
import sys

sys.path.insert(0, ".")


def _fresh_bench():
    import importlib

    import bench
    importlib.reload(bench)
    return bench


def test_probe_failure_emits_parseable_null_record(capsys, monkeypatch):
    bench = _fresh_bench()
    # conftest pins JAX_PLATFORMS=cpu, which short-circuits the probe;
    # this test simulates the TPU path
    monkeypatch.delenv("JAX_PLATFORMS", raising=False)
    bench._probe_backend_once = lambda t: (False, "simulated wedge")
    err = bench.ensure_backend_alive(probe_timeout_s=1, backoffs=())
    assert err is not None and "unavailable" in err
    bench._emit_failure(err)
    last = capsys.readouterr().out.strip().splitlines()[-1]
    rec = json.loads(last)
    assert rec["metric"] == bench._HEADLINE_METRIC
    assert rec["value"] is None and "error" in rec


def test_failure_after_headline_keeps_the_real_value(capsys):
    # a crash in a later --config all stage must re-emit the REAL
    # headline (with the error attached) as the last line, not null it
    bench = _fresh_bench()
    bench._headline_record = {
        "metric": bench._HEADLINE_METRIC, "value": 12199.42,
        "unit": "images/sec/chip", "vs_baseline": 2.44}
    bench._emit_failure("ssd512-nms exploded")
    last = capsys.readouterr().out.strip().splitlines()[-1]
    rec = json.loads(last)
    assert rec["value"] == 12199.42
    assert rec["post_headline_error"] == "ssd512-nms exploded"


def test_probe_skipped_on_cpu(monkeypatch):
    bench = _fresh_bench()
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")

    def boom(t):  # pragma: no cover - must not be called
        raise AssertionError("probe must not run under JAX_PLATFORMS=cpu")

    bench._probe_backend_once = boom
    assert bench.ensure_backend_alive() is None


def test_fold_for_serving_passthrough_and_override_preservation():
    from tfssd_tpu import get_hyper_params
    from tfssd_tpu.utils.fold_bn import fold_for_serving

    # BN-free variables (VGG-style): exact passthrough, no tree rebuild
    cfg = get_hyper_params("vgg16", compute_dtype="bfloat16")
    variables = {"params": {"w": 1.0}, "batch_stats": {}}
    cfg2, model2, v2 = fold_for_serving(cfg, variables)
    assert cfg2 is cfg and v2 is variables

    # already-folded config: passthrough too
    cfg_f = get_hyper_params("mobilenet_v2", fold_bn=True)
    v = {"params": {"w": 1.0}}
    cfg3, _, v3 = fold_for_serving(cfg_f, v)
    assert cfg3 is cfg_f and v3 is v

    # a foldable config keeps its OTHER overrides (dataclasses.replace,
    # not a fresh get_hyper_params — the review-caught drift risk)
    cfg_o = get_hyper_params("mobilenet_v2", compute_dtype="bfloat16",
                             nms_prefilter_anchors=256)
    stats = {"bn": {"mean": 0.0, "var": 1.0}}
    cfg4, _, _ = fold_for_serving(
        cfg_o, {"params": {}, "batch_stats": stats})
    assert cfg4.fold_bn and cfg4.compute_dtype == "bfloat16"
    assert cfg4.nms_prefilter_anchors == 256
