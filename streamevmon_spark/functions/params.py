"""Detector/operator parameter specs with validated ranges and
cross-parameter constraints.

The reference declares every detector parameter with default/min/max
plus constraints between parameters, validated at pipeline build time
(reference: parameters/ParameterSpec.scala,
parameters/constraints/ParameterConstraint.scala; e.g.
``triggerCount < maxHistory``,
detectors/changepoint/ChangepointDetector.scala:144-153). The Spark
engine keeps the same contract as plain dataclasses: specs are data,
validation is one pure function, and ``validated(...)`` is what
operators call before building a plan — catching bad configs at
build time, not at executor time, exactly like the reference's
YamlDagRunner parameter check (runners/unified/YamlDagRunner.scala:160).
"""

from __future__ import annotations

from dataclasses import dataclass
from numbers import Real


@dataclass(frozen=True)
class ParamSpec:
    name: str
    default: Real
    min: Real | None = None
    max: Real | None = None

    def check(self, value: Real) -> None:
        if self.min is not None and value < self.min:
            raise ValueError(
                f"{self.name}={value} below minimum {self.min}"
            )
        if self.max is not None and value > self.max:
            raise ValueError(
                f"{self.name}={value} above maximum {self.max}"
            )


@dataclass(frozen=True)
class LessThan:
    """Cross-parameter constraint: params[a] < params[b] (the reference's
    ParameterConstraint.LessThan)."""

    a: str
    b: str

    def check(self, params: dict) -> None:
        if not params[self.a] < params[self.b]:
            raise ValueError(
                f"constraint violated: {self.a}={params[self.a]} must be "
                f"< {self.b}={params[self.b]}"
            )


# per-detector specs mirroring the reference defaults
# (src/main/resources/detectorSettings.yaml + per-detector ParameterSpecs)
DETECTOR_SPECS: dict[str, tuple[list[ParamSpec], list[LessThan]]] = {
    "baseline": (
        [
            # max 300 mirrors BaselineDetector.scala's spec bound
            ParamSpec("max_history", 50, 1, 300),
            ParamSpec("percentile", 0.10, 0.0, 1.0),
            ParamSpec("threshold", 25, 0, 100),
            ParamSpec("purge_s", 600, 0, None),
        ],
        [],
    ),
    "changepoint": (
        [
            ParamSpec("max_history", 60, 1, 600),
            ParamSpec("trigger_count", 40, 1, 600),
            ParamSpec("ignore_outlier_normal_count", 1, 0, 600),
            ParamSpec("severity_threshold", 30, 0, 100),
            ParamSpec("minimum_event_interval_s", 10, 0, None),
            ParamSpec("purge_s", 60, 0, None),
        ],
        [LessThan("trigger_count", "max_history")],
    ),
    "distdiff": (
        [
            ParamSpec("recents_count", 20, 1, 600),
            ParamSpec("drop_extreme_n", 2, 0, 300),
            ParamSpec("z_threshold", 5.0, 0.0, None),
            ParamSpec("minimum_change", 1.05, 1.0, None),
            ParamSpec("purge_s", 1200, 0, None),
        ],
        [LessThan("drop_extreme_n", "recents_count")],
    ),
    "windowed_distdiff": (
        [
            ParamSpec("window_s", 3600, 1, None),
            ParamSpec("recents_count", 20, 1, 600),
            ParamSpec("drop_extreme_n", 2, 0, 300),
            ParamSpec("z_threshold", 5.0, 0.0, None),
            ParamSpec("minimum_change", 1.05, 1.0, None),
        ],
        [LessThan("drop_extreme_n", "recents_count")],
    ),
    "loss": (
        [
            ParamSpec("max_history", 30, 1, 600),
            ParamSpec("loss_count", 10, 1, 600),
            ParamSpec("consecutive_count", 5, 1, 600),
        ],
        [
            LessThan("consecutive_count", "max_history"),
        ],
    ),
    "mode": (
        [
            ParamSpec("max_history", 30, 1, 600),
            ParamSpec("min_frequency", 6, 1, 600),
            ParamSpec("min_prominence", 3, 0, 600),
            ParamSpec("threshold", 7.5, 0, None),
            # 60 mirrors detectorSettings.yaml / ModeDetector.scala
            # inactivityPurgeTime (and the kernel signature default)
            ParamSpec("purge_s", 60, 0, None),
        ],
        [
            LessThan("min_frequency", "max_history"),
            # ModeDetector.scala's minProminence < maxHistory constraint
            LessThan("min_prominence", "max_history"),
        ],
    ),
    "spike": (
        [
            ParamSpec("lag", 50, 1, 600),
            ParamSpec("threshold", 50.0, 0.0, None),
            ParamSpec("influence", 0.01, 0.0, 1.0),
            ParamSpec("purge_s", 60, 0, None),
        ],
        [],
    ),
}


def validated(detector: str, **overrides) -> dict:
    """Defaults merged with overrides, range- and constraint-checked.
    Unknown parameter names are rejected (typo guard)."""
    if detector not in DETECTOR_SPECS:
        raise ValueError(f"unknown detector {detector!r}")
    specs, constraints = DETECTOR_SPECS[detector]
    by_name = {s.name: s for s in specs}
    unknown = set(overrides) - set(by_name)
    if unknown:
        raise ValueError(
            f"unknown parameters for {detector}: {sorted(unknown)}"
        )
    params = {s.name: overrides.get(s.name, s.default) for s in specs}
    for s in specs:
        s.check(params[s.name])
    for c in constraints:
        c.check(params)
    return params
