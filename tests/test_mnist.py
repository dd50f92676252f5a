"""SimpleDenseNet / MNIST template parity + CLI smoke (SURVEY §2.7 last
row). The reference ships configs/model/mnist.yaml but its
`mnist_module.py` / `mnist_datamodule.py` are absent from src; the net
itself (src/models/components/simple_dense_net.py) exists and is the
parity oracle here."""
import importlib.util
import sys
from pathlib import Path

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from tests.reference_oracle import reference_available
from tunevlseg_tpu.models.simple_dense_net import SimpleDenseNet

REPO = Path(__file__).resolve().parent.parent


@pytest.mark.skipif(not reference_available(),
                    reason="reference repo not mounted")
def test_simple_dense_net_parity():
    from tests.reference_oracle import REFERENCE
    if str(REFERENCE) not in sys.path:
        sys.path.insert(0, str(REFERENCE))
    from src.models.components.simple_dense_net import (
        SimpleDenseNet as RefNet)

    torch.manual_seed(0)
    ref = RefNet(784, 64, 128, 64, 10).double().eval()

    net = SimpleDenseNet(lin1_size=64, lin2_size=128, lin3_size=64)
    x = np.random.default_rng(0).normal(size=(4, 1, 28, 28))
    variables = net.init(jax.random.PRNGKey(0),
                         jnp.asarray(x, jnp.float32), train=False)

    # torch Sequential indices: 0,3,6 Linear; 1,4,7 BatchNorm1d; 9 head
    params, stats = {}, {}
    for i, seq in enumerate((0, 3, 6), start=1):
        lin, bn = ref.model[seq], ref.model[seq + 1]
        params[f"lin{i}"] = {
            "kernel": lin.weight.detach().numpy().T.astype(np.float32),
            "bias": lin.bias.detach().numpy().astype(np.float32)}
        params[f"bn{i}"] = {
            "scale": bn.weight.detach().numpy().astype(np.float32),
            "bias": bn.bias.detach().numpy().astype(np.float32)}
        stats[f"bn{i}"] = {
            "mean": bn.running_mean.detach().numpy().astype(np.float32),
            "var": bn.running_var.detach().numpy().astype(np.float32)}
    head = ref.model[9]
    params["head"] = {
        "kernel": head.weight.detach().numpy().T.astype(np.float32),
        "bias": head.bias.detach().numpy().astype(np.float32)}
    assert jax.tree_util.tree_structure(
        {"params": params, "batch_stats": stats}) == \
        jax.tree_util.tree_structure(
            jax.tree_util.tree_map(lambda v: np.asarray(v), dict(variables)))

    with torch.no_grad():
        want = ref(torch.tensor(x, dtype=torch.float64)).numpy()
    got = net.apply({"params": params, "batch_stats": stats},
                    jnp.asarray(x, jnp.float32), train=False)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)


def test_train_mnist_cli_smoke():
    spec = importlib.util.spec_from_file_location(
        "train_mnist", REPO / "scripts" / "train_mnist.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    result = mod.main(["--synthetic", "--epochs", "3"])
    assert result["val_acc"] > 0.9
    assert np.isfinite(result["test_loss"])


def test_read_idx_roundtrip(tmp_path):
    import struct

    spec = importlib.util.spec_from_file_location(
        "train_mnist", REPO / "scripts" / "train_mnist.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    arr = np.arange(2 * 3 * 4, dtype=np.uint8).reshape(2, 3, 4)
    p = tmp_path / "probe-idx3-ubyte"
    with open(p, "wb") as fp:
        fp.write(struct.pack(">HBB", 0, 0x08, 3))
        fp.write(struct.pack(">III", 2, 3, 4))
        fp.write(arr.tobytes())
    np.testing.assert_array_equal(mod.read_idx(p), arr)
