"""Parameter-spec validation tests (functions/params.py) — the
reference's ParameterSpec range/constraint semantics
(reference: parameters/ParameterSpec.scala,
detectors/changepoint/ChangepointDetector.scala:144-153)."""

from __future__ import annotations

import pytest

from streamevmon_spark.functions.params import validated


def test_defaults_pass_for_every_detector():
    for det in ("baseline", "changepoint", "distdiff", "loss", "mode",
                "spike"):
        params = validated(det)
        assert params  # non-empty dict of defaults


def test_override_merging():
    p = validated("baseline", max_history=5)
    assert p["max_history"] == 5
    assert p["percentile"] == 0.10  # default retained


def test_range_violation_rejected():
    with pytest.raises(ValueError, match="below minimum"):
        validated("baseline", max_history=0)
    with pytest.raises(ValueError, match="above maximum"):
        validated("spike", influence=1.5)


def test_cross_parameter_constraint():
    # reference: triggerCount < maxHistory
    with pytest.raises(ValueError, match="trigger_count"):
        validated("changepoint", trigger_count=100, max_history=50)
    validated("changepoint", trigger_count=49, max_history=50)


def test_unknown_parameter_rejected():
    with pytest.raises(ValueError, match="unknown parameters"):
        validated("loss", bogus_param=1)


def test_detect_applies_validation(spark, sf_dir):
    from streamevmon_spark.data.transcripts import load_transcripts
    from streamevmon_spark.operators.detect import detect

    df = load_transcripts(spark, sf_dir)
    with pytest.raises(ValueError, match="trigger_count"):
        detect(df, "changepoint", trigger_count=100, max_history=50)


def test_spec_defaults_match_kernel_signature_defaults():
    """Every spec default must equal the kernel function's own keyword
    default — a drift here silently changes default-config semantics
    (the mode purge_s=180-vs-60 regression class)."""
    import inspect

    from streamevmon_spark.functions.detectors import (
        DETECTOR_FOLDS,
        DETECTORS,
    )
    from streamevmon_spark.functions.params import DETECTOR_SPECS

    for name, (specs, _) in DETECTOR_SPECS.items():
        # windowed_distdiff has no whole-series batch kernel (the batch
        # operator windows externally); its fold carries the defaults
        kernel = DETECTORS.get(name) or DETECTOR_FOLDS[name][1]
        sig = inspect.signature(kernel)
        kernel_defaults = {
            p.name: p.default
            for p in sig.parameters.values()
            if p.default is not inspect.Parameter.empty
        }
        for s in specs:
            assert s.name in kernel_defaults, (name, s.name)
            assert s.default == kernel_defaults[s.name], (
                name, s.name, s.default, kernel_defaults[s.name]
            )


def test_mode_prominence_constraint():
    from streamevmon_spark.functions.params import validated

    with pytest.raises(ValueError, match="min_prominence"):
        validated("mode", min_prominence=30, max_history=30)
    validated("mode", min_prominence=29, max_history=30)
