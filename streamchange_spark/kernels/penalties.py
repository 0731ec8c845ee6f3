"""Penalty functions for change-point scores.

Behaviour parity with /root/reference/streamchange/penalties.py:7-82 (formulas
only; implementation is original). A penalty is a callable of the affected
size, linearly scaled by a tunable ``scale`` knob so penalty tuners can adjust
severity without re-deriving the default value.
"""

from __future__ import annotations

import math

DEFAULT_ARL = 10000


class BasePenalty:
    """Scalar penalty = ``scale * default_penalty(affected_size)``."""

    def __init__(self, scale: float = 1.0):
        if scale < 0:
            raise ValueError("scale must be >= 0.")
        self.scale = scale

    def default_penalty(self, affected_size: int = 1) -> float:
        raise NotImplementedError

    def __call__(self, affected_size: int = 1) -> float:
        return self.scale * self.default_penalty(affected_size)


class ConstantPenalty(BasePenalty):
    """Constant penalty, independent of affected size."""

    def __init__(self, value: float, scale: float = 1.0):
        super().__init__(scale)
        if value < 0:
            raise ValueError("ConstantPenalty value must be >= 0.")
        self.value = value

    def default_penalty(self, affected_size: int = 1) -> float:
        return self.value


class BIC(ConstantPenalty):
    """Bayesian information criterion penalty: ``2 * p * log(arl)``."""

    def __init__(self, arl: int = DEFAULT_ARL, p: int = 1, scale: float = 1.0):
        self.arl = arl
        self.p = p
        super().__init__(2.0 * p * math.log(arl), scale)


class ChiSquarePenalty(ConstantPenalty):
    """Chi-square tail penalty: ``p + 2*sqrt(p*log(arl)) + 2*log(arl)``."""

    def __init__(self, arl: int = DEFAULT_ARL, p: int = 1, scale: float = 1.0):
        self.arl = arl
        self.p = p
        log_arl = math.log(arl)
        super().__init__(p + 2.0 * math.sqrt(p * log_arl) + 2.0 * log_arl, scale)


class LinearPenalty(BasePenalty):
    """Penalty linear in the affected size: ``intercept + size * slope``."""

    def __init__(self, intercept: float, slope: float, scale: float = 1.0):
        super().__init__(scale)
        if intercept < 0:
            raise ValueError("LinearPenalty intercept must be >= 0.")
        if slope < 0:
            raise ValueError("LinearPenalty slope must be >= 0.")
        self.intercept = intercept
        self.slope = slope

    def default_penalty(self, affected_size: int = 1) -> float:
        return self.intercept + affected_size * self.slope


class LinearConstPenalty(BasePenalty):
    """Linear penalty below a transition point, constant above it."""

    def __init__(
        self,
        constant_value: float,
        intercept: float,
        slope: float,
        transition_point: float | None = None,
        scale: float = 1.0,
    ):
        super().__init__(scale)
        self.constant_value = constant_value
        self.intercept = intercept
        self.slope = slope
        if transition_point is None:
            transition_point = (constant_value - intercept) / slope if slope > 0 else 0
        self.transition_point = transition_point

    def default_penalty(self, affected_size: int = 1) -> float:
        if affected_size <= self.transition_point:
            return self.intercept + affected_size * self.slope
        return self.constant_value


def as_penalty(penalty) -> BasePenalty:
    """Coerce a number into a ConstantPenalty (parity: numeric penalties are
    auto-wrapped throughout the reference, e.g. amoc/estimators.py:86-88)."""
    if isinstance(penalty, BasePenalty):
        return penalty
    return ConstantPenalty(float(penalty))
