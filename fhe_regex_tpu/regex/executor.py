"""Level-scheduled batched executor.

The reference forces one lazy closure at a time, each op dispatching a full
CPU bootstrap (engine.rs:22-35 -> execution.rs -> tfhe-rs).  Here the
hash-consed micro-op DAG (regex/circuit.py) is topologically level-scheduled
ahead of time: every level is ONE batched PBS launch over all bootstraps
whose inputs are ready — the SPMD shape TPUs want (SURVEY.md §7).

Each level executes:
  1. affine gather:  x_i = sum_k coef_ik * slab[slot_ik] + const_i * delta
     (cheap int32 VPU work)
  2. batched PBS with per-instance LUT selection
  3. scatter of outputs into the ciphertext slab

Level batch widths are padded to power-of-two buckets to bound XLA
recompilations; padded instances write to a trash slot.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from fhe_regex_tpu.crypto.golden import make_lut_poly
from fhe_regex_tpu.ops.luts import LutKey, lut_fn
from fhe_regex_tpu.ops.pbs import make_pbs_fn
from fhe_regex_tpu.params import Params
from fhe_regex_tpu.regex.circuit import BitVal, CircuitBuilder, Node, PbsOp

I32 = jnp.int32
U32 = np.uint32


@dataclasses.dataclass
class LevelPlan:
    in_slots: np.ndarray   # [W, 3] int32
    in_coefs: np.ndarray   # [W, 3] int32
    consts: np.ndarray     # [W] int32 (plaintext units)
    lut_idx: np.ndarray    # [W] int32
    out_idx: np.ndarray    # [W] int32


@dataclasses.dataclass
class CompiledCircuit:
    params: Params
    num_slots: int         # content slots + op outputs (+1 trash at the end)
    levels: List[LevelPlan]
    luts: np.ndarray       # [L, N] uint32
    root: Node
    ct_ops: int
    cache_hits: int

    @property
    def pbs_count(self) -> int:
        return sum(int((lv.lut_idx >= 0).sum()) for lv in self.levels)


MAX_LEVEL_BATCH = 256   # largest PBS batch one kernel launch handles (VMEM)


def default_min_bucket() -> int:
    """On TPU, pad every level to MAX_LEVEL_BATCH: the 866-step scan's fixed
    per-step cost dominates at small widths anyway, and a single batch shape
    means ONE compiled executable for every circuit level (the axon remote
    Mosaic compiler costs minutes per distinct shape).  On CPU keep small
    buckets — compiles are cheap and small batches much faster."""
    import jax
    return MAX_LEVEL_BATCH if jax.default_backend() == "tpu" else 8


def _bucket(w: int, min_bucket: int = 8) -> int:
    b = min_bucket
    while b < w:
        b *= 2
    return b


def compile_circuit(params: Params, builder: CircuitBuilder, root: Node,
                    min_bucket: int = 8,
                    max_batch: int = MAX_LEVEL_BATCH) -> CompiledCircuit:
    lut_ids: Dict[LutKey, int] = {}
    for op in builder.ops:
        if op.lut not in lut_ids:
            lut_ids[op.lut] = len(lut_ids)
    luts = (np.stack([make_lut_poly(params, lut_fn(k)) for k in lut_ids])
            if lut_ids else np.zeros((1, params.polynomial_size), U32))
    # pad the LUT table to a FIXED row count and the slab to a multiple of
    # 1024 so circuits share XLA executable shapes — otherwise every
    # pattern/content-length recompiles each level kernel.  128 covers every
    # possible byte-wise LUT (4 nibble-op kinds x 16 constants + 5 gates).
    lut_rows = 128 if luts.shape[0] <= 128 else _bucket(luts.shape[0], 128)
    luts = np.concatenate(
        [luts, np.zeros((lut_rows - luts.shape[0], luts.shape[1]), U32)])

    by_level: Dict[int, List[PbsOp]] = {}
    for op in builder.ops:
        by_level.setdefault(op.level, []).append(op)

    num_slots = builder.num_content_slots + len(builder.ops) + 1
    num_slots = ((num_slots + 1023) // 1024) * 1024
    trash = num_slots - 1
    levels = []
    for lvl in sorted(by_level):
        ops = by_level[lvl]
        # split oversized levels into <= max_batch kernel launches
        for c0 in range(0, len(ops), max_batch):
            chunk = ops[c0:c0 + max_batch]
            w = min(_bucket(len(chunk), min_bucket), max_batch)
            in_slots = np.zeros((w, 3), np.int32)
            in_coefs = np.zeros((w, 3), np.int32)
            consts = np.zeros(w, np.int32)
            lut_idx = np.full(w, -1, np.int32)
            out_idx = np.full(w, trash, np.int32)
            for i, op in enumerate(chunk):
                in_slots[i] = op.in_slots
                in_coefs[i] = op.in_coefs
                consts[i] = op.const
                lut_idx[i] = lut_ids[op.lut]
                out_idx[i] = op.out_slot
            levels.append(LevelPlan(in_slots, in_coefs, consts, lut_idx, out_idx))

    return CompiledCircuit(
        params=params,
        num_slots=num_slots,
        levels=levels,
        luts=luts,
        root=root,
        ct_ops=builder.ct_ops,
        cache_hits=builder.cache_hits,
    )


class Executor:
    """Runs compiled circuits against one server key's device material.

    With a mesh, each level's PBS batch is sharded across devices
    (variant/data parallelism, SURVEY.md §2.3); circuits must then be
    compiled with min_bucket >= mesh size.
    """

    def __init__(self, params: Params, dev_key, mesh=None):
        self.params = params
        self.mesh = mesh
        if mesh is None:
            self.pbs = make_pbs_fn(dev_key)
        else:
            from fhe_regex_tpu.parallel.mesh import make_sharded_pbs_fn
            self.pbs = make_sharded_pbs_fn(dev_key, mesh)

    def _run_level(self, slab, luts, lv_in_slots, lv_in_coefs, lv_consts,
                   lv_lut_idx, lv_out_idx):
        delta = self.params.delta
        gathered = slab[lv_in_slots]                           # [W, 3, n+1]
        x = jnp.sum(lv_in_coefs[:, :, None] * gathered, axis=1)
        x = x.at[:, -1].add(lv_consts * jnp.int32(delta))
        outs = self.pbs(luts, jnp.maximum(lv_lut_idx, 0), x)
        return slab.at[lv_out_idx].set(outs)

    @functools.cached_property
    def _level_jit(self):
        return jax.jit(self._run_level, donate_argnums=(0,))

    def run(self, circuit: CompiledCircuit, content_blocks: np.ndarray,
            profile: bool = False) -> np.ndarray:
        """content_blocks: [len, num_blocks, n+1] uint32 -> radix result
        [num_blocks, n+1] uint32.

        With profile=True each level is synchronized and timed; per-level
        stats land in ``self.last_run_stats`` (the TPU-side analog of the
        reference's ct-op logging, SURVEY.md §5).
        """
        import time

        params = self.params
        n1 = params.lwe_dimension + 1
        slab_np = np.zeros((circuit.num_slots, n1), np.int32)
        if content_blocks.size:
            flat = content_blocks.reshape(-1, n1).view(np.int32)
            slab_np[1:1 + flat.shape[0]] = flat
        slab = jnp.asarray(slab_np)
        luts = jnp.asarray(circuit.luts.view(np.int32))
        stats = []
        for lv in circuit.levels:
            t0 = time.time() if profile else 0.0
            slab = self._level_jit(
                slab, luts,
                jnp.asarray(lv.in_slots), jnp.asarray(lv.in_coefs),
                jnp.asarray(lv.consts), jnp.asarray(lv.lut_idx),
                jnp.asarray(lv.out_idx),
            )
            if profile:
                slab.block_until_ready()
                stats.append({"width": int(lv.lut_idx.shape[0]),
                              "active": int((lv.lut_idx >= 0).sum()),
                              "seconds": time.time() - t0})
        self.last_run_stats = stats
        return self._finalize(circuit, slab)

    def run_many(self, circuit: CompiledCircuit,
                 contents: np.ndarray) -> np.ndarray:
        """Match ONE compiled pattern against MANY encrypted contents.

        contents: [C, len, num_blocks, n+1] uint32 -> [C, num_blocks, n+1].

        The serving fast path: all C contents share the circuit, so every
        level's bootstrap batch is C x width — far better MXU utilization
        than C separate runs (levels amortize across contents).
        """
        params = self.params
        C = contents.shape[0]
        n1 = params.lwe_dimension + 1
        S = circuit.num_slots
        slab_np = np.zeros((C * S, n1), np.int32)
        if contents.size:
            flat = contents.reshape(C, -1, n1).view(np.int32)
            for ci in range(C):
                slab_np[ci * S + 1: ci * S + 1 + flat.shape[1]] = flat[ci]
        slab = jnp.asarray(slab_np)
        luts = jnp.asarray(circuit.luts.view(np.int32))
        offs = (np.arange(C, dtype=np.int32) * S)[:, None]
        for lv in circuit.levels:
            # tile the level across contents with per-content slot offsets;
            # padded entries (lut_idx < 0) keep gathering slot 0 (the
            # reserved zero ct) in every content's slab segment
            active = lv.lut_idx >= 0
            in_slots = np.where((lv.in_coefs != 0) & active[:, None],
                                lv.in_slots[None] + offs[:, None], 0)
            out_idx = np.where(active, lv.out_idx[None] + offs,
                               lv.out_idx[None])
            t_slots = in_slots.reshape(-1, 3)
            t_coefs = np.broadcast_to(lv.in_coefs,
                                      (C,) + lv.in_coefs.shape).reshape(-1, 3)
            t_consts = np.broadcast_to(lv.consts,
                                       (C,) + lv.consts.shape).reshape(-1)
            t_lut = np.broadcast_to(lv.lut_idx,
                                    (C,) + lv.lut_idx.shape).reshape(-1)
            t_out = out_idx.reshape(-1)
            # the flattened batch C*W may exceed what one kernel launch
            # handles in VMEM — chunk it
            for c0 in range(0, t_out.shape[0], MAX_LEVEL_BATCH):
                sl = slice(c0, c0 + MAX_LEVEL_BATCH)
                slab = self._level_jit(
                    slab, luts,
                    jnp.asarray(t_slots[sl]), jnp.asarray(t_coefs[sl]),
                    jnp.asarray(t_consts[sl]), jnp.asarray(t_lut[sl]),
                    jnp.asarray(t_out[sl]),
                )
        slab_host = np.asarray(slab).view(U32)
        out = np.zeros((C, params.num_blocks, n1), U32)
        val = circuit.root.val
        for ci in range(C):
            if val.sign == 0:
                out[ci, 0, -1] = U32(val.const * params.delta)
            else:
                ct = slab_host[ci * S + val.slot].astype(np.int64)
                blk = val.sign * ct
                blk[-1] += val.const * params.delta
                out[ci, 0] = (blk % (1 << 32)).astype(U32)
        return out

    def _finalize(self, circuit: CompiledCircuit, slab) -> np.ndarray:
        """Assemble the radix result ciphertext from the root bit value.

        A compile-time-constant root yields a *trivial* ciphertext, matching
        Q10 (e.g. /./ returns a noiseless ct in the reference)."""
        params = self.params
        val: BitVal = circuit.root.val
        n1 = params.lwe_dimension + 1
        out = np.zeros((params.num_blocks, n1), U32)
        if val.sign == 0:
            out[0, -1] = U32(val.const * params.delta)
            return out
        ct = np.asarray(slab[val.slot]).view(U32).astype(np.int64)
        block0 = val.sign * ct
        block0[-1] += val.const * params.delta
        out[0] = (block0 % (1 << 32)).astype(U32)
        return out
