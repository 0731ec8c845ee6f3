"""Throwaway parity harness: run the reference (njit stubbed) next to our
kernels on the reference's own fixtures and compare outputs exactly."""

import sys
import types

import numpy as np

# Stub numba.njit to a no-op decorator and river stats before importing the reference.
numba = types.ModuleType("numba")


def njit(f=None, **kw):
    if f is None:
        return lambda g: g
    return f


numba.njit = njit
sys.modules["numba"] = numba

river = types.ModuleType("river")
river_stats = types.ModuleType("river.stats")
river_stats_base = types.ModuleType("river.stats.base")


class Univariate:
    pass


class Mean(Univariate):
    def __init__(self):
        self.n = 0
        self._mean = 0.0

    def clone(self, include_attributes=False):
        return Mean()

    def update(self, x):
        self.n += 1
        self._mean += (x - self._mean) / self.n
        return self

    def get(self):
        return self._mean


river_stats_base.Univariate = Univariate
river_stats.base = river_stats_base
river_stats.Mean = Mean
river.stats = river_stats
river_stream = types.ModuleType("river.stream")
river.stream = river_stream
sys.modules["river"] = river
sys.modules["river.stats"] = river_stats
sys.modules["river.stats.base"] = river_stats_base
sys.modules["river.stream"] = river_stream

for name in ("optuna", "plotly"):
    mod = types.ModuleType(name)
    sys.modules[name] = mod
sys.modules["optuna"].Trial = object
sys.modules["optuna"].samplers = types.SimpleNamespace(GridSampler=object)
sys.modules["optuna"].study = types.SimpleNamespace(create_study=lambda **kw: None)
sys.modules["plotly.graph_objects"] = types.ModuleType("plotly.graph_objects")
sys.modules["plotly.express"] = types.ModuleType("plotly.express")

sys.path.insert(0, "/root/reference")
sys.path.insert(0, "/root/repo")

import pandas as pd

from streamchange.data import simulate as ref_simulate
from streamchange.amoc import CUSUM as RefCUSUM, CUSUM0 as RefCUSUM0
from streamchange.amoc import MaxCUSUM as RefMaxCUSUM, SumCUSUM as RefSumCUSUM
from streamchange.amoc import WindowSegmentor as RefWS
from streamchange.penalties import BIC as RefBIC
from streamchange.pelt import Pelt as RefPelt, L2Cost as RefL2Cost
from streamchange.capa import Capa as RefCapa, ConstMeanL2 as RefCML2
from streamchange.offline.pelt import OfflinePelt as RefOffPelt
from streamchange.offline.costs import OfflineL2Cost as RefOffL2
from streamchange.sequential import (
    LordenPollakScore as RefLP,
    CUSUM0Score as RefC0S,
    AggregatedScore as RefAgg,
    SequentialChangeDetector as RefSeq,
)

from streamchange_spark.kernels import (
    BIC,
    CUSUM,
    CUSUM0,
    AggregatedScore,
    Capa,
    ConstMeanL2,
    CUSUM0Score,
    L2Cost,
    LordenPollakScore,
    MaxCUSUM,
    OfflinePelt,
    Pelt,
    PenalisedScore,
    SequentialChangeDetector,
    SumCUSUM,
    WindowSegmentor,
    simulate,
)

fails = []


def check(name, cond):
    print(("PASS " if cond else "FAIL ") + name)
    if not cond:
        fails.append(name)


# simulate parity
for kw in [
    dict(seed=145),
    dict(means=[30, 0], seg_lens=[50], seed=145),
    dict(means=[0, 30], seg_lens=[100], p=1, seed=2),
    dict(means=[0, 10, 0], seg_lens=[50], p=1, seed=5),
    dict(seed=145, p=5),
]:
    a = ref_simulate(**kw).to_numpy()
    b = simulate(**kw)
    check(f"simulate {kw}", np.array_equal(a, b))

# AMOC estimators on fixtures
pairs = [
    (RefCUSUM, CUSUM),
    (RefCUSUM0, CUSUM0),
    (RefMaxCUSUM, MaxCUSUM),
    (RefSumCUSUM, SumCUSUM),
]
for rc, mc in pairs:
    for kw, pen in [
        (dict(seed=145), 0.0),
        (dict(means=[30, 0], seg_lens=[50], seed=145), None),
        (dict(means=[0, 30], seg_lens=[5]), 0.0),
    ]:
        x = ref_simulate(**kw).to_numpy()
        r = rc(pen) if pen is not None else rc()
        m = mc(pen) if pen is not None else mc()
        r.fit(x)
        m.fit(x)
        same = (
            (np.isnan(r.score) and np.isnan(m.score))
            or (r.score == m.score)
        ) and r.changepoint == m.changepoint
        check(f"{rc.__name__} {kw} pen={pen}", same)

# NaN behaviour
xnan = np.array([1, 1, 1, np.nan, 40, 40]).reshape(-1, 1)
r = RefCUSUM(0.0).fit(xnan)
m = CUSUM(0.0).fit(xnan)
check("CUSUM nan", np.isnan(r.score) and np.isnan(m.score) and not m.change_detected)

# WindowSegmentor end-to-end
df = ref_simulate([0, 30], [100], p=1, seed=2)
rws = RefWS(RefCUSUM(penalty=RefBIC(scale=10)), 4, 100)
rws.fit(df)
mws = WindowSegmentor(CUSUM(penalty=BIC(scale=10)), 4, 100)
mws.fit(df.to_numpy())
check("WS step-100", list(rws.changepoints_) == [int(v) for v in mws.changepoints_])

for kw, seed, args in [
    (dict(means=[0, 10, 0], seg_lens=[100]), 5, (2, 100)),
    (dict(means=[0, 10, 0, 10, 0], seg_lens=[30]), 5, (2, 50)),
    (dict(means=[0, 10, 0, 20, 0, 1, 0, 3, 5, 0, 4], seg_lens=[20]), 34, (4, 100)),
    (dict(means=[0, 10, 0], seg_lens=[50]), 5, (5, 100)),
]:
    df = ref_simulate(**kw, p=1, seed=seed)
    for pen in [0.1, 2, 10]:
        rws = RefWS(RefCUSUM(penalty=pen), *args)
        rws.fit(df)
        mws = WindowSegmentor(CUSUM(penalty=pen), *args)
        mws.fit(df.to_numpy())
        check(
            f"WS {kw['means']} seed={seed} pen={pen}",
            list(rws.changepoints_) == [int(v) for v in mws.changepoints_],
        )

# geom candidates
df = ref_simulate([0, 10, 0], [50], p=1, seed=5)
for ct, cs in [("linear", 2), ("linear", 5), ("geom", 1.1), ("geom", 2.0)]:
    rws = RefWS(RefCUSUM(), candidate_type=ct, candidate_step=cs)
    rws.fit(df)
    mws = WindowSegmentor(CUSUM(), candidate_type=ct, candidate_step=cs)
    mws.fit(df.to_numpy())
    check(f"WS candidates {ct} {cs}", list(rws.changepoints_) == [int(v) for v in mws.changepoints_])

# Pelt
df = ref_simulate([0, 30, 0], [100], p=1, seed=2)
rp = RefPelt(RefL2Cost(), minsl=2, maxsl=10000)
rp.fit(df[0])
mp = Pelt(L2Cost(), minsl=2, maxsl=10000)
mp.fit(df.to_numpy()[:, 0])
check(
    "Pelt 3seg",
    rp.changepoints_ == [int(v) for v in mp.changepoints_]
    and [(s["start"], s["end"], s["size"]) for s in rp.segments_]
    == [(int(s["start"]), int(s["end"]), int(s["size"])) for s in mp.segments_],
)

# Capa
df = ref_simulate([0, 30], [100], p=1, seed=2)
df.iloc[10] = 200
rc = RefCapa(RefCML2(), minsl=2, maxsl=1000, predict_point_anomalies=True)
rc.fit(df[0])
mc = Capa(ConstMeanL2(), minsl=2, maxsl=1000, predict_point_anomalies=True)
mc.fit(df.to_numpy()[:, 0])
check(
    "Capa",
    [(a["start"], a["end"], a["size"]) for a in rc.collective_anomalies_]
    == [(int(a["start"]), int(a["end"]), int(a["size"])) for a in mc.collective_anomalies_]
    and [(a["start"], a["end"]) for a in rc.point_anomalies_]
    == [(int(a["start"]), int(a["end"])) for a in mc.point_anomalies_],
)

# OfflinePelt
df = ref_simulate([0, 30, 0], [100], p=1, seed=2)
rop = RefOffPelt(RefOffL2(), minsl=2)
rop.fit(df)
mop = OfflinePelt(minsl=2)
mop.fit(df.to_numpy())
check(
    "OfflinePelt",
    rop.changepoints_ == mop.changepoints_
    and rop.segments_[["start", "end", "size"]].values.tolist()
    == [[s["start"], s["end"], s["size"]] for s in mop.segments_],
)

# Sequential scores
x = ref_simulate(means=[0, 30], seg_lens=[50], seed=145)[0]
xm = ref_simulate(means=[0, 30], seg_lens=[50], seed=145, p=5)
for RC, MC in [(RefLP, LordenPollakScore), (RefC0S, CUSUM0Score)]:
    r = RC()
    r.fit(x)
    m = MC()
    m.fit(x.to_numpy())
    check(f"{RC.__name__} raw path", np.array_equal(r.values_.to_numpy(), m.values_))

    r = RC().penalise(1.0)
    r.fit(x)
    m = PenalisedScore(MC(), 1.0)
    m.fit(x.to_numpy())
    check(f"{RC.__name__} pen path", np.array_equal(r.values_.to_numpy(), m.values_))

    rdet = RefSeq(RefAgg(RC(), aggregator=np.sum).penalise(1.0), True, 50)
    rdet.fit(xm)
    mdet = SequentialChangeDetector(
        PenalisedScore(AggregatedScore(MC(), aggregator=np.sum), 1.0), True, 50
    )
    mdet.fit(xm.to_numpy())
    check(
        f"{RC.__name__} detector alarms",
        list(rdet.alarms_) == [int(v) for v in mdet.alarms_]
        and np.array_equal(rdet.penalised_scores_.to_numpy(), mdet.penalised_scores_),
    )

# ---------------------------------------------------------------------------
# Randomized fuzz: random multi-segment series through every detector family,
# reference vs kernels, exact output equality. Exercises the block-batched
# Pelt/Capa replays and WindowSegmentor fast paths far beyond the fixtures.
# ---------------------------------------------------------------------------
fuzz_rng = np.random.RandomState(20260817)
for trial in range(8):
    n_segs = int(fuzz_rng.randint(1, 6))
    means = [float(fuzz_rng.uniform(-20, 20)) for _ in range(n_segs)]
    seg_len = int(fuzz_rng.randint(20, 80))
    seed = int(fuzz_rng.randint(0, 10_000))
    df = ref_simulate(means, [seg_len], p=1, seed=seed)
    x = df.to_numpy()[:, 0]
    pen = float(fuzz_rng.choice([0.5, 2.0, 8.0]))
    minsl = int(fuzz_rng.randint(2, 6))
    # reference WindowSegmentor is O(window^2)/pt un-jitted; keep windows small
    maxsl = int(fuzz_rng.choice([30, 60, 100]))
    tag = f"fuzz{trial} segs={n_segs} len={seg_len} pen={pen} m={minsl}/{maxsl}"

    rws = RefWS(RefCUSUM(penalty=pen), minsl + 2, maxsl)
    rws.fit(df)
    mws = WindowSegmentor(CUSUM(penalty=pen), minsl + 2, maxsl)
    mws.fit(x)
    check(f"WS {tag}", list(rws.changepoints_) == [int(v) for v in mws.changepoints_])

    # Pelt fuzz pins minsl=1: with minsl>1 the REFERENCE's backward
    # segment walk (pelt/pelt.py:57-72) infinite-loops whenever the trail
    # reaches a last_cpt==0 entry from the sub-minsl warm-up (our kernel
    # documents and guards that divergence; it cannot be compared there).
    rp = RefPelt(RefL2Cost(pen), minsl=1, maxsl=maxsl)
    rp.fit(df[0])
    mp = Pelt(L2Cost(pen), minsl=1, maxsl=maxsl)
    mp.fit(x)
    check(
        f"Pelt {tag}",
        rp.changepoints_ == [int(v) for v in mp.changepoints_]
        and [(s["start"], s["end"], s["size"]) for s in rp.segments_]
        == [(int(s["start"]), int(s["end"]), int(s["size"])) for s in mp.segments_],
    )

    rc = RefCapa(RefCML2(pen), minsl=minsl, maxsl=maxsl, predict_point_anomalies=True)
    rc.fit(df[0])
    mc = Capa(ConstMeanL2(pen), minsl=minsl, maxsl=maxsl, predict_point_anomalies=True)
    mc.fit(x)
    check(
        f"Capa {tag}",
        [(a["start"], a["end"], a["size"]) for a in rc.collective_anomalies_]
        == [(int(a["start"]), int(a["end"]), int(a["size"])) for a in mc.collective_anomalies_]
        and [(a["start"], a["end"]) for a in rc.point_anomalies_]
        == [(int(a["start"]), int(a["end"])) for a in mc.point_anomalies_],
    )

    rdet = RefSeq(RefLP().penalise(pen), True, minsl)
    rdet.fit(df[0])
    mdet = SequentialChangeDetector(
        PenalisedScore(LordenPollakScore(), pen), True, minsl
    )
    mdet.fit(x)
    check(
        f"Seq {tag}",
        list(rdet.alarms_) == [int(v) for v in mdet.alarms_]
        and np.array_equal(rdet.penalised_scores_.to_numpy(), mdet.penalised_scores_),
    )

print()
print("FAILURES:", fails if fails else "none")
sys.exit(1 if fails else 0)
