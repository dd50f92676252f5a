"""TPE sampler: must beat random search on a smooth synthetic objective."""
import math

import numpy as np

from tunevlseg_tpu.utils.tpe import REFERENCE_SPACES, Space, TPESampler


def objective(params):
    # minimum at lr=3e-4, wd=1e-4, depth=6
    return ((math.log10(params["model.optimizer.lr"]) + 3.52) ** 2
            + (math.log10(params["model.weight_decay"]) + 4.0) ** 2
            + 0.05 * (params["model.prompt_depth"] - 6) ** 2)


def run(sampler, n=40):
    best = math.inf
    for _ in range(n):
        p = sampler.ask()
        v = objective(p)
        sampler.tell(p, v)
        best = min(best, v)
    return best


def test_spaces_round_trip():
    for s in REFERENCE_SPACES.values():
        import random
        rng = random.Random(0)
        for _ in range(20):
            x = s.sample(rng)
            assert s.low <= x <= s.high
            u = s.to_unit(x)
            assert abs(s.to_unit(s.from_unit(u)) - u) < 0.05


def test_tpe_beats_random():
    tpe_bests, rand_bests = [], []
    for seed in range(5):
        tpe = TPESampler(REFERENCE_SPACES, seed=seed)
        tpe_bests.append(run(tpe))
        rand = TPESampler(REFERENCE_SPACES, seed=seed, n_startup=10 ** 9)
        rand_bests.append(run(rand))
    assert np.mean(tpe_bests) < np.mean(rand_bests), (tpe_bests, rand_bests)


def test_int_dim_stays_integral():
    tpe = TPESampler({"d": Space("int", 1, 10)}, seed=0, n_startup=2)
    for _ in range(15):
        p = tpe.ask()
        assert p["d"] == int(p["d"]) and 1 <= p["d"] <= 10
        tpe.tell(p, (p["d"] - 4) ** 2)
