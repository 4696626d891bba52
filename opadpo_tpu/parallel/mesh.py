"""Device mesh & axis conventions.

The reference scales purely with data-parallel torchrun DDP over NCCL
(reference ``run/train_opa_dpo.sh:96-100``, ``utils/distributed_utils.py``).
On TPU the entire distributed story is one GSPMD program over a
``jax.sharding.Mesh``:

- axis ``data``  — batch sharding; gradient sync is an XLA all-reduce over
  ICI (replaces DDP/NCCL).
- axis ``model`` — optional tensor parallelism for the 13B config: attention
  heads and MLP hidden dim sharded; XLA inserts the all-reduces.

There is no separate collective library: lay out shardings here, let the
compiler schedule the communication.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    """How to carve the device grid.

    ``data x model`` must equal the device count.  ``model=1`` reproduces the
    reference's pure-DP regime; ``model>1`` enables tensor parallelism that
    the reference never had (SURVEY §2.8).
    """

    data: int = -1   # -1: use all remaining devices
    model: int = 1

    def resolve(self, n_devices: int) -> "MeshConfig":
        model = self.model
        data = self.data if self.data > 0 else n_devices // model
        if data * model != n_devices:
            raise ValueError(
                f"mesh {data}x{model} != {n_devices} devices"
            )
        return MeshConfig(data=data, model=model)


def make_mesh(
    config: Optional[MeshConfig] = None,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    config = (config or MeshConfig()).resolve(len(devices))
    dev_array = np.asarray(devices).reshape(config.data, config.model)
    return Mesh(dev_array, (DATA_AXIS, MODEL_AXIS))


def batch_spec() -> P:
    """Batch-axis sharding for activations / inputs."""
    return P(DATA_AXIS)


def replicated_spec() -> P:
    return P()


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, batch_spec())


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, replicated_spec())
