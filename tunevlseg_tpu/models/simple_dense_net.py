"""SimpleDenseNet — the template's MNIST MLP (SURVEY §2.7 last row).

Reference: src/models/components/simple_dense_net.py:5-50 (Linear ->
BatchNorm1d -> ReLU stacks + linear head). The reference's accompanying
`mnist_module.py` / `mnist_datamodule.py` are absent from its src tree —
configs/model/mnist.yaml points at modules that don't exist — so the
runnable counterpart here is scripts/train_mnist.py with the same
hyperparameters (mnist.yaml: Adam lr 1e-3, ReduceLROnPlateau(0.1, 10),
sizes 64/128/64, batch 128, split 55k/5k/10k)."""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


class SimpleDenseNet(nn.Module):
    input_size: int = 784
    lin1_size: int = 256
    lin2_size: int = 256
    lin3_size: int = 256
    output_size: int = 10
    dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = x.reshape(x.shape[0], -1)
        for i, width in enumerate((self.lin1_size, self.lin2_size,
                                   self.lin3_size)):
            x = nn.Dense(width, name=f"lin{i + 1}")(x)
            # torch BatchNorm1d(eps=1e-5, momentum=0.1): flax momentum is
            # the complement of torch's
            x = nn.BatchNorm(use_running_average=not train, epsilon=1e-5,
                             momentum=0.9, name=f"bn{i + 1}")(x)
            x = nn.relu(x)
        return nn.Dense(self.output_size, name="head")(x)
