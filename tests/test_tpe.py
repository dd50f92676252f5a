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


def test_parse_space_grammar():
    from tunevlseg_tpu.utils.tpe import parse_space

    s = parse_space("tag(log, interval(1e-5, 5e-3))")
    assert s.kind == "log" and s.low == 1e-5 and s.high == 5e-3
    s = parse_space("range(1, 11)")
    assert s.kind == "int" and (s.low, s.high, s.step) == (1, 10, 1)
    s = parse_space("range(32, 97, 32)")
    assert sorted({s.from_unit(u / 10) for u in range(11)}) == [32, 64, 96]
    s = parse_space("choice(16, 20, 32)")
    assert s.options == (16, 20, 32)
    assert s.to_unit(20) == 0.5 and s.from_unit(0.6) == 20
    s = parse_space("choice(true, false)")
    assert s.options == (True, False)
    s = parse_space("choice([32], [64])")
    assert s.options == ([32], [64])
    import pytest
    with pytest.raises(ValueError):
        parse_space("weird(1, 2)")


def test_hparams_search_config_group():
    """Every configs/hparams_search/*.yaml loads and the per-strategy spaces
    differ where the reference's do (shared_attn adds projector knobs,
    cocoop/maple add meta-net width + LoRA toggle)."""
    from pathlib import Path

    from tunevlseg_tpu.train import CONFIG_DIR
    from tunevlseg_tpu.utils.tpe import TPESampler, load_search_config

    group = Path(CONFIG_DIR) / "hparams_search"
    configs = {p.stem: load_search_config(p) for p in group.glob("*.yaml")}
    assert {"coop", "cocoop", "vpt", "maple", "shared_attn",
            "shared_separate", "tiny"} <= set(configs)

    base_keys = set(configs["coop"]["spaces"])
    assert base_keys == {"model.optimizer.lr", "model.weight_decay",
                         "model.prompt_depth"}
    assert "model.learner.proj_num_heads" in configs["shared_attn"]["spaces"]
    assert "model.learner.use_lora_proj" in configs["cocoop"]["spaces"]
    assert "model.learner.context_dim" in configs["shared_separate"]["spaces"]
    assert configs["vpt"]["seed"] != configs["coop"]["seed"]  # ref seeds

    # every space is sampleable + round-trips through the TPE machinery
    for name, sc in configs.items():
        sampler = TPESampler(sc["spaces"], seed=1, n_startup=2)
        for i in range(4):
            params = sampler.ask()
            assert set(params) == set(sc["spaces"]), name
            sampler.tell(params, float(i))
