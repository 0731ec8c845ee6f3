"""Pure-NumPy change-point kernels — the exact-match oracle.

These modules re-express the math of NorskRegnesentral/streamchange
(/root/reference) with no Spark, pandas, numba or river dependency, so that
(a) the reference's pytest suite can be ported 1:1 against them, and
(b) Spark operators can call the very same kernels inside Arrow-batched
grouped-map pandas UDFs, making Spark-vs-oracle equality trivial.
"""

from .amoc import CUSUM, CUSUM0, AMOCEstimator, MaxCUSUM, SumCUSUM, SumCUSUM0
from .capa import Capa, ConstMeanL2
from .offline_pelt import OfflineL2Cost, OfflinePelt
from .pelt import L2Cost, Pelt
from .penalties import (
    BIC,
    BasePenalty,
    ChiSquarePenalty,
    ConstantPenalty,
    LinearConstPenalty,
    LinearPenalty,
    as_penalty,
)
from .segmentation import fit_segmentation
from .sequential import (
    AggregatedScore,
    BaseRawScore,
    CUSUM0Score,
    LordenPollakScore,
    PenalisedScore,
    SequentialChangeDetector,
)
from .simulate import simulate
from .utils import Profiler, dropna_series, geomspace_int, has_method, iter_pandas
from .stats import Mean, MovingSum, Quantile, StatBuffer, StatUnion, Var
from .tuners import (
    AMOCPenaltyTuner,
    GridPenaltyTuner,
    SequentialScorePenaltyTuner,
    make_dyadic_intervals,
    make_random_intervals,
    make_stepwise_intervals,
    targetscaler,
)
from .window_segmentor import RingBuffer, WindowSegmentor

__all__ = [
    "Profiler",
    "dropna_series",
    "geomspace_int",
    "has_method",
    "iter_pandas",
    "AMOCEstimator",
    "AMOCPenaltyTuner",
    "AggregatedScore",
    "BIC",
    "BasePenalty",
    "BaseRawScore",
    "CUSUM",
    "CUSUM0",
    "CUSUM0Score",
    "Capa",
    "ChiSquarePenalty",
    "ConstMeanL2",
    "ConstantPenalty",
    "GridPenaltyTuner",
    "L2Cost",
    "LinearConstPenalty",
    "LinearPenalty",
    "LordenPollakScore",
    "MaxCUSUM",
    "Mean",
    "MovingSum",
    "OfflineL2Cost",
    "OfflinePelt",
    "Pelt",
    "PenalisedScore",
    "Quantile",
    "RingBuffer",
    "SequentialChangeDetector",
    "SequentialScorePenaltyTuner",
    "StatBuffer",
    "StatUnion",
    "SumCUSUM",
    "SumCUSUM0",
    "Var",
    "WindowSegmentor",
    "as_penalty",
    "fit_segmentation",
    "make_dyadic_intervals",
    "make_random_intervals",
    "make_stepwise_intervals",
    "simulate",
    "targetscaler",
]
