"""Device-mesh parallelism: the TPU-native replacement for the reference's
NCCL process groups.

The reference builds a DP x CP x SP topology over NCCL ranks
(``videosys/core/parallel_mgr.py:9-34``) and moves activations with explicit
collectives (``videosys/core/comm.py``): split_sequence/gather_sequence, the
DSP all-to-all "dynamic switch" (``open_sora_transformer_3d.py:275-296``), and
xfuser Ulysses/ring attention for Wan (``magcache_generate.py:818-829``).

On TPU the same topologies are expressed declaratively:

- mesh axes ``(dp, sp, tp)`` over ICI (`build_mesh`);
- **DP** — batch axis sharded over ``dp``. The reference's CP ("CFG
  parallelism", batch-of-2 split, ``open_sora_transformer_3d.py:443-451``) is
  just the lane-stacked batch riding ``dp``;
- **SP** — token axis sharded over ``sp``; XLA inserts the all-gathers /
  all-to-alls around attention that comm.py hand-writes (Ulysses equivalence);
  the MagCache residual cache shards with the activations exactly like the
  reference's sharded-cache pattern (``eval/…/opensora.py:284-312``) since it
  is just a scan carry with the same sharding;
- **TP** — hidden/heads axis sharded over ``tp`` via Megatron-style weight
  shardings (column-parallel qkv/ffn-in, row-parallel proj/ffn-out);
- **FSDP/ZeRO** (``comm.py:15-26``, torch FSDP flags) — weight sharding over
  the mesh via `shard_params`; no separate runtime needed for inference.

Activation constraints enter the models through `maybe_shard(x, kind)`, a
no-op unless a `MeshPlan` is active (`use_mesh`), so single-chip paths compile
unchanged.
"""

from __future__ import annotations

import contextlib
import contextvars
import dataclasses
import re
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

AXIS_DP, AXIS_SP, AXIS_TP = "dp", "sp", "tp"

__all__ = [
    "AXIS_DP", "AXIS_SP", "AXIS_TP", "MeshPlan", "build_mesh", "use_mesh",
    "maybe_shard", "shard_params", "activation_sharding", "init_distributed",
]


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> int:
    """Multi-host bring-up — the TPU translation of the reference's NCCL
    rendezvous (``torch.distributed.init_process_group`` at
    ``videosys/core/parallel_mgr.py:37-51`` / ``mp_utils.py:32-48`` TCP-store
    port haggling). On TPU pods `jax.distributed.initialize()` reads the
    runtime environment (no args needed under standard launchers); explicit
    coordinator args cover bare-metal launches. Safe to call single-host
    (no-op). Returns the global device count; after this, `build_mesh` over
    `jax.devices()` spans all hosts and pjit emits ICI/DCN collectives."""
    if num_processes is not None and num_processes > 1 or coordinator_address:
        # jax requires the full triple once a coordinator is given explicitly
        # (bare metal has no cluster env to auto-detect them from)
        assert num_processes is not None and process_id is not None, (
            "explicit coordinator_address needs num_processes and process_id "
            "(no cluster environment to auto-detect them from)")
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)
    else:
        try:
            jax.distributed.initialize()
        except (ValueError, RuntimeError):
            pass    # single-process / no cluster env: local devices only
    return len(jax.devices())


def build_mesh(dp: int = 1, sp: int = 1, tp: int = 1,
               devices: Optional[Sequence] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    n = dp * sp * tp
    assert len(devices) >= n, f"need {n} devices, have {len(devices)}"
    arr = np.asarray(devices[:n]).reshape(dp, sp, tp)
    return Mesh(arr, (AXIS_DP, AXIS_SP, AXIS_TP))


@dataclasses.dataclass(frozen=True)
class MeshPlan:
    """A mesh plus the activation partition conventions used by the models."""

    mesh: Mesh

    def spec(self, kind: str, ndim: int) -> P:
        """Partition spec per activation kind.

        kinds:
          tokens:   [rows, S, D]        -> (dp, sp, tp)
          latents:  [B, ...spatial, C]  -> (dp, None...)
          context:  [rows, T, D]        -> (dp, None, tp)
          heads:    [B, S, H, Dh]       -> (dp, sp, tp, None)
        """
        if kind == "tokens":
            return P(AXIS_DP, AXIS_SP, AXIS_TP)
        if kind == "latents":
            return P(*([AXIS_DP] + [None] * (ndim - 1)))
        if kind == "context":
            return P(AXIS_DP, None, AXIS_TP)
        if kind == "heads":
            return P(AXIS_DP, AXIS_SP, AXIS_TP, None)
        raise ValueError(kind)


_ACTIVE: contextvars.ContextVar[Optional[MeshPlan]] = contextvars.ContextVar(
    "magcache_tpu_mesh_plan", default=None)


@contextlib.contextmanager
def use_mesh(plan: Optional[MeshPlan]):
    """Activate a MeshPlan for model `maybe_shard` hooks (trace-time scoped)."""
    tok = _ACTIVE.set(plan)
    try:
        yield plan
    finally:
        _ACTIVE.reset(tok)


def maybe_shard(x, kind: str):
    plan = _ACTIVE.get()
    if plan is None:
        return x
    return jax.lax.with_sharding_constraint(
        x, NamedSharding(plan.mesh, plan.spec(kind, x.ndim)))


# --------------------------------------------------------------------------
# Parameter shardings (Megatron pattern over `tp`, replicated over dp/sp)
# --------------------------------------------------------------------------

# Path-suffix -> which axis of the weight is sharded over tp.
# Column-parallel (output features sharded): qkv projections, ffn in.
_COL_PAT = re.compile(
    r"(q|k|v|cross_q|cross_k|cross_v|cross_k_img|cross_v_img|ffn1|"
    r"img_qkv|txt_qkv|lin1|img_mlp1|txt_mlp1|qkv|"
    # vchitect temporal/cross projections; latte/osp/omnigen2 ffn + swiglu
    r"qt|kt|vt|qc|ff1|ffc1|w1|w3)$")
# Row-parallel (input features sharded): output projections, ffn out.
_ROW_PAT = re.compile(
    r"(o|cross_o|ffn2|img_proj|txt_proj|lin2|img_mlp2|txt_mlp2|"
    r"ot|oc|add_out|add_out_t|ff2|ffc2|w2|(?<!cap_)proj)$")


def _param_spec(path: str, ndim: int) -> P:
    """Sharding for a weight leaf given its pytree path (joined with '/')."""
    parts = path.split("/")
    leaf = parts[-1]
    parent = parts[-2] if len(parts) >= 2 else ""
    if leaf == "w" and ndim >= 2:
        if _COL_PAT.search(parent):
            return P(*([None] * (ndim - 1) + [AXIS_TP]))
        if _ROW_PAT.search(parent):
            return P(*([None] * (ndim - 2) + [AXIS_TP, None]))
    if leaf == "b" and _COL_PAT.search(parent):
        return P(*([None] * (ndim - 1) + [AXIS_TP]))
    if parent == "blocks" and ndim >= 2:
        # umt5 stacked bare-leaf layout (models/umt5.py): q/k/v + gated-FF
        # ins are column-parallel, o/wo row-parallel
        if leaf in ("q", "k", "v", "wi0", "wi1"):
            return P(*([None] * (ndim - 1) + [AXIS_TP]))
        if leaf in ("o", "wo"):
            return P(*([None] * (ndim - 2) + [AXIS_TP, None]))
    return P()  # replicate


def param_shardings(params, mesh: Mesh):
    """NamedSharding pytree for a param tree (or its ShapeDtypeStructs) —
    the Megatron-style specs without any device_put; feeds both real-weight
    placement (`shard_params`) and AOT lowering of geometries too large to
    materialize (the 14B derisk test)."""
    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    out = []
    for kp, leaf in flat:
        path = "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in kp)
        spec = _param_spec(path, np.ndim(leaf))
        out.append(NamedSharding(mesh, spec))
    return jax.tree_util.tree_unflatten(treedef, out)


def shard_params(params, mesh: Mesh):
    """device_put the param pytree with Megatron-style NamedShardings."""
    sh = param_shardings(params, mesh)
    return jax.tree_util.tree_map(jax.device_put, params, sh)


def activation_sharding(mesh: Mesh, kind: str, ndim: int) -> NamedSharding:
    return NamedSharding(mesh, MeshPlan(mesh).spec(kind, ndim))
