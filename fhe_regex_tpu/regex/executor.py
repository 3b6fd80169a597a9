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
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from fhe_regex_tpu.crypto.golden import make_lut_poly
from fhe_regex_tpu.ops.luts import LutKey, lut_fn
from fhe_regex_tpu.params import Params
from fhe_regex_tpu.regex.circuit import BitVal, CircuitBuilder, Node, PbsOp

I32 = jnp.int32
U32 = np.uint32


class MvMarginError(ValueError):
    """A multi-value LUT factor fails the >=5 sigma noise-margin check.

    Distinct from other compile ValueErrors so the packed-path auto-mv
    fallback (`_compile_auto_mv`) can catch exactly the expected rejection
    without masking genuine mv compile bugs (advisor finding, round 2)."""


@dataclasses.dataclass
class LevelPlan:
    in_slots: np.ndarray   # [W, 3] int32
    in_coefs: np.ndarray   # [W, 3] int32
    consts: np.ndarray     # [W] int32 (plaintext units)
    lut_idx: np.ndarray    # [W] int32
    out_idx: np.ndarray    # [W] int32
    # multi-value plan (compile_circuit(multivalue=True); None on the
    # classic path): ops sharing an affine input share one blind rotation
    # of the common test poly; each op derives its LUT at extract time
    # (ops/mv.py).  rot_* are the [R, ...] deduped rotation inputs;
    # mv_leader maps each op to its rotation row; mv_weights are the ops'
    # LUT factor weights over the static support.
    rot_slots: "np.ndarray | None" = None
    rot_coefs: "np.ndarray | None" = None
    rot_consts: "np.ndarray | None" = None
    mv_weights: "np.ndarray | None" = None   # columns = mv_positions only
    mv_leader: "np.ndarray | None" = None
    mv_rot_count: int = 0          # active rotations (R before padding)
    # STATIC support positions actually used by this level's LUT factors
    # (dead support columns would cost a full negacyclic roll each)
    mv_positions: "tuple | None" = None


@dataclasses.dataclass
class CompiledCircuit:
    params: Params
    num_slots: int         # content slots + op outputs (+1 trash at the end)
    levels: List[LevelPlan]
    luts: np.ndarray       # [L, N] uint32
    root: Node
    ct_ops: int
    cache_hits: int
    # multi-root circuits (compile_match_multi / multi-pattern serving):
    # roots[i] is pattern i's result bit; None for single-root circuits.
    roots: "List[Node] | None" = None
    # multi-value bootstrap circuit (shared rotations; ops/mv.py)
    multivalue: bool = False

    @property
    def pbs_count(self) -> int:
        return sum(int((lv.lut_idx >= 0).sum()) for lv in self.levels)

    @property
    def rotation_count(self) -> int:
        """Blind rotations actually executed (== pbs_count on the classic
        path; smaller under multivalue when ops share inputs)."""
        if not self.multivalue:
            return self.pbs_count
        return sum(lv.mv_rot_count for lv in self.levels)

    @property
    def all_roots(self) -> List[Node]:
        return self.roots if self.roots is not None else [self.root]


MAX_LEVEL_BATCH = 256   # largest PBS batch one compiled-circuit level uses
WIDE_LEVEL_BATCH = 1024  # serving (run_many) wide-chunk shape: packed level
#                          batches >= this run at the kernel's large-batch
#                          throughput (v5e: 913+ pbs/s at B>=1024 vs ~680-730
#                          at W=256).  One extra Mosaic executable per process.


def _np_to_limbs(a: np.ndarray, torus_bits: int) -> np.ndarray:
    """uint32 -> int32 view; uint64 -> int32 limb pairs [..., 2] (LE)."""
    if torus_bits == 32:
        return np.ascontiguousarray(a).view(np.int32)
    v = np.ascontiguousarray(a.astype(np.uint64))
    return v.view(np.int32).reshape(a.shape + (2,))


def _limbs_to_np(a: np.ndarray, torus_bits: int) -> np.ndarray:
    """Inverse of _np_to_limbs on host arrays."""
    if torus_bits == 32:
        return np.ascontiguousarray(a).view(U32)
    return np.ascontiguousarray(a).view(np.uint64).reshape(a.shape[:-1])


def _assemble_root(params: Params, val: BitVal,
                   ct_u: "np.ndarray | None") -> np.ndarray:
    """Radix result ciphertext from the root bit value (any torus width).

    A compile-time-constant root yields a *trivial* ciphertext, matching
    Q10 (e.g. /./ returns a noiseless ct in the reference)."""
    n1 = params.lwe_dimension + 1
    dt = U32 if params.torus_bits == 32 else np.uint64
    out = np.zeros((params.num_blocks, n1), dt)
    if val.sign == 0:
        out[0, -1] = dt(val.const * params.delta)
        return out
    with np.errstate(over="ignore"):
        blk = ct_u.astype(dt) if val.sign == 1 else (dt(0) - ct_u.astype(dt))
        blk = blk.copy()
        blk[-1] = dt(blk[-1] + dt(val.const * params.delta))
    out[0] = blk
    return out


SMALL_LEVEL_BATCH = 64   # second TPU executable shape for narrow levels


def default_min_bucket() -> int:
    """On TPU, levels use TWO executable shapes: SMALL_LEVEL_BATCH for
    narrow levels and MAX_LEVEL_BATCH for the rest (measured on v5e with
    the split-bank kernel: a 64-wide launch costs 0.155 s vs 0.349 s for a
    256-wide one — the bank build is the B-independent floor).  Each shape
    is one remote Mosaic compile, paid once per process.  On CPU keep small
    power-of-two buckets — compiles are cheap and small batches much
    faster."""
    import jax
    return SMALL_LEVEL_BATCH if jax.default_backend() == "tpu" else 8


# Above this many bootstraps the fused-levels megarun buys nothing warm
# (the async dispatch queue hides the launch floor once levels span
# multiple chunks: measured 4.08 s fused vs 4.07 s per-level on the
# ~1000-bootstrap 256-char /abc/ circuit) while its giant inlined XLA
# program costs +170 s of cold compile (393 s vs 225 s).  Fusing pays a
# few % on small/deep circuits where depth x dispatch-floor dominates
# (north-star 0.82 s fused vs 0.86 s; quantifiers 2.58 vs 2.75).
FUSE_MAX_PBS = 1500


def active_bsk_drop(params: Params,
                    backend: "str | None" = None) -> "tuple | None":
    """The key-limb drop the selected backend applies to these params.

    Only ``pallas64-bg`` (the 64-bit TPU default) rounds the bootstrap
    key; every other backend keeps it whole.  With ``backend=None`` the
    default resolution for the params is assumed.  Used so noise gates
    and p_fail reporting reflect the real operating point — not the
    undropped key, and not a drop a non-dropping backend never applies
    (advisor rounds 4 and 5)."""
    if params.torus_bits != 64:
        return None
    from fhe_regex_tpu.ops.pbs import default_drop64, resolve_backend
    if resolve_backend(backend, params) != "pallas64-bg":
        return None
    drop = default_drop64(params)
    return drop if drop != (0, 0) else None


def _dev_key_drop(dev_key) -> "tuple | None":
    """The key-limb drop a PREPARED key actually carries (None if the
    backend doesn't drop, or the drop is (0, 0))."""
    drop = getattr(dev_key, "drop64", None)
    return tuple(drop) if drop and tuple(drop) != (0, 0) else None


def worst_mv_norm2(circuit) -> "int | None":
    """Largest ||u||^2 over the circuit's multivalue LUT factors (the
    blind-rotation variance amplifier), or None for classic circuits."""
    if not getattr(circuit, "multivalue", False):
        return None
    worst = 0
    for lv in circuit.levels:
        if lv.mv_weights is not None and lv.mv_weights.size:
            worst = max(worst, int(
                (lv.mv_weights.astype(np.int64) ** 2).sum(axis=1).max()))
    return worst or None


_DROP_DEFAULT = object()   # sentinel: "assume the default backend's drop"


def circuit_pfail(params: Params, circuit, bsk_drop=_DROP_DEFAULT) -> dict:
    """The failure-probability contract at the engine's actual operating
    point: includes the backend's key-limb drop and the circuit's worst
    mv factor norm.  Pass ``bsk_drop`` (a tuple or None) to report for a
    specific prepared key — the Executor threads its real ``dev_key``
    drop here, so runs on jnp64/pallas64 or an explicit (0, 0) key are
    not reported with a drop they never applied (advisor round 5).
    Non-finite log2 values (zero-noise test sets) are reported as None
    so the dict stays strict-JSON-serializable."""
    import math

    drop = active_bsk_drop(params) if bsk_drop is _DROP_DEFAULT else bsk_drop
    mvn = worst_mv_norm2(circuit)
    rep = params.noise_budget_report(mv_norm2=mvn, bsk_drop=drop)
    lp = rep["log2_p_fail_per_pbs"]
    return {
        "pbs_count": circuit.pbs_count,
        "mv_norm2": mvn,
        "bsk_drop": list(drop) if drop else None,
        "log2_p_fail_per_pbs": lp if math.isfinite(lp) else None,
        "p_fail_circuit": params.p_fail_circuit(
            circuit.pbs_count, mv_norm2=mvn, bsk_drop=drop),
    }


def default_fuse(circuit) -> bool:
    """Default for Executor.run(fuse=None): megarun on TPU below the
    size cap; FHE_REGEX_FUSE_LEVELS=0|1 forces either way."""
    import os

    env = os.environ.get("FHE_REGEX_FUSE_LEVELS")
    if env is not None:
        return env == "1"
    import jax
    # cap on rotation_count, not pbs_count: fused dispatch/compile cost
    # scales with blind rotations actually executed, and multivalue
    # circuits run up to ~43% fewer rotations than bootstraps
    return (jax.default_backend() == "tpu"
            and circuit.rotation_count <= FUSE_MAX_PBS)


def _chunk_sizes(total: int, use_wide: bool) -> List[int]:
    """Launch-shape plan for a packed run_many level of `total` active ops.

    Greedy over the three executable shapes {WIDE, MAX, SMALL}: full wide
    chunks first, then a cost check — one padded wide launch beats four
    narrow ones (measured ~1.1 s vs 4 x ~0.35 s on v5e) — then MAX chunks
    with a SMALL tail.  Every size returned is one of the three shapes, so
    no new executables appear beyond the (at most) three per process.
    """
    sizes: List[int] = []
    rem = total
    if use_wide:
        sizes += [WIDE_LEVEL_BATCH] * (rem // WIDE_LEVEL_BATCH)
        rem -= WIDE_LEVEL_BATCH * (rem // WIDE_LEVEL_BATCH)
        if rem > 3 * MAX_LEVEL_BATCH:
            sizes.append(WIDE_LEVEL_BATCH)
            rem = 0
    if rem:
        if rem <= SMALL_LEVEL_BATCH:
            sizes.append(SMALL_LEVEL_BATCH)
        else:
            sizes += [MAX_LEVEL_BATCH] * (rem // MAX_LEVEL_BATCH)
            tail = rem % MAX_LEVEL_BATCH
            if tail:
                sizes.append(SMALL_LEVEL_BATCH if tail <= SMALL_LEVEL_BATCH
                             else MAX_LEVEL_BATCH)
    return sizes


def _bucket(w: int, min_bucket: int = 8) -> int:
    b = min_bucket
    while b < w:
        b *= 2
    return b


def compile_circuit(params: Params, builder: CircuitBuilder,
                    root: "Node | List[Node]",
                    min_bucket: int = 8,
                    max_batch: int = MAX_LEVEL_BATCH,
                    multivalue: bool = False,
                    bsk_drop=_DROP_DEFAULT) -> CompiledCircuit:
    """Level-schedule a builder's op DAG.  `root` may be one Node or a list
    of them (multi-pattern circuits); `run`/`run_many` then return one
    result row per root.

    multivalue=True compiles the shared-rotation plan (ops/mv.py): ops in a
    level that share an affine input share ONE blind rotation; compiled
    regex circuits measure 20-43% shared rotations on class/alternation
    patterns.  Same decrypted results; output noise amplified only on the
    blind-rotation component (>= 5 sigma margin asserted in tests).
    """
    roots: "List[Node] | None" = None
    if isinstance(root, (list, tuple)):
        roots = list(root)
        if not roots:
            raise ValueError("need at least one root")
        root = roots[0]
    lut_ids: Dict[LutKey, int] = {}
    for op in builder.ops:
        if op.lut not in lut_ids:
            lut_ids[op.lut] = len(lut_ids)
    luts = (np.stack([make_lut_poly(params, lut_fn(k)) for k in lut_ids])
            if lut_ids else np.zeros((1, params.polynomial_size),
                                     U32 if params.torus_bits == 32
                                     else np.uint64))
    # pad the LUT table to a FIXED row count and the slab to a multiple of
    # 1024 so circuits share XLA executable shapes — otherwise every
    # pattern/content-length recompiles each level kernel.  128 covers every
    # possible byte-wise LUT (4 nibble-op kinds x 16 constants + 5 gates).
    lut_rows = 128 if luts.shape[0] <= 128 else _bucket(luts.shape[0], 128)
    luts = np.concatenate(
        [luts, np.zeros((lut_rows - luts.shape[0], luts.shape[1]), luts.dtype)])

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
            if min_bucket >= SMALL_LEVEL_BATCH:
                # TPU two-shape scheme: {min_bucket, max_batch} only (every
                # extra shape is a minutes-long remote Mosaic compile)
                w = min_bucket if len(chunk) <= min_bucket else max_batch
            else:
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
            plan = LevelPlan(in_slots, in_coefs, consts, lut_idx, out_idx)
            if multivalue:
                _attach_mv_plan(params, plan, chunk, w, min_bucket, max_batch,
                                bsk_drop=bsk_drop)
            levels.append(plan)

    return CompiledCircuit(
        params=params,
        num_slots=num_slots,
        levels=levels,
        luts=luts,
        root=root,
        ct_ops=builder.ct_ops,
        cache_hits=builder.cache_hits,
        roots=roots,
        multivalue=multivalue,
    )


def _attach_mv_plan(params: Params, plan: LevelPlan, chunk, w: int,
                    min_bucket: int, max_batch: int,
                    bsk_drop=_DROP_DEFAULT) -> None:
    """Dedup a level chunk's affine inputs into a rotation batch and record
    each op's (leader, LUT factor weights)."""
    from fhe_regex_tpu.ops.luts import mv_support_positions, mv_weights

    S = len(mv_support_positions(params))
    groups: Dict[Tuple, int] = {}
    leaders: List[Tuple] = []
    leader = np.zeros(w, np.int32)
    weights = np.zeros((w, S), np.int32)
    wcache: Dict[Tuple, np.ndarray] = {}
    for i, op in enumerate(chunk):
        key = (op.in_slots, op.in_coefs, op.const)
        r = groups.get(key)
        if r is None:
            r = len(leaders)
            groups[key] = r
            leaders.append(key)
        leader[i] = r
        wv = wcache.get(op.lut)
        if wv is None:
            wv = wcache[op.lut] = mv_weights(params, op.lut)
            u2 = int((wv.astype(np.int64) ** 2).sum())
            # gate at the REAL operating point: the default 64-bit backend
            # rounds the bootstrap key (active_bsk_drop), and that term is
            # amplified by the mv norm too (advisor round 4).  Callers that
            # know the backend thread its actual drop (or None) via
            # bsk_drop so non-dropping backends aren't over-rejected
            # (advisor round 5).
            rep = params.noise_budget_report(
                mv_norm2=u2,
                bsk_drop=(active_bsk_drop(params)
                          if bsk_drop is _DROP_DEFAULT else bsk_drop))
            if rep["sigma_margin"] < 5.0:
                raise MvMarginError(
                    f"multivalue factor of LUT {op.lut!r} has ||u||^2={u2}, "
                    f"leaving only {rep['sigma_margin']:.2f} sigma (< 5) — "
                    f"compile this circuit with multivalue=False")
        weights[i] = wv
    R = len(leaders)
    # pad the rotation batch to the same executable shapes as op widths
    if min_bucket >= SMALL_LEVEL_BATCH:
        rb = min_bucket if R <= min_bucket else w
    else:
        rb = min(_bucket(R, min_bucket), w)
    rot_slots = np.zeros((rb, 3), np.int32)
    rot_coefs = np.zeros((rb, 3), np.int32)
    rot_consts = np.zeros(rb, np.int32)
    for r, (slots, coefs, const) in enumerate(leaders):
        rot_slots[r] = slots
        rot_coefs[r] = coefs
        rot_consts[r] = const
    # drop dead support columns: each kept column costs one negacyclic
    # roll of the whole accumulator batch at run time
    pos = mv_support_positions(params)
    active_cols = np.flatnonzero(weights.any(axis=0))
    if active_cols.size == 0:
        active_cols = np.asarray([0])
    plan.rot_slots = rot_slots
    plan.rot_coefs = rot_coefs
    plan.rot_consts = rot_consts
    plan.mv_weights = np.ascontiguousarray(weights[:, active_cols])
    plan.mv_leader = leader
    plan.mv_rot_count = R
    plan.mv_positions = tuple(int(pos[c]) for c in active_cols)


class Executor:
    """Runs compiled circuits against one server key's device material.

    With a mesh, each level's PBS batch is sharded across devices
    (variant/data parallelism, SURVEY.md §2.3); circuits must then be
    compiled with min_bucket >= mesh size.
    """

    def __init__(self, params: Params, dev_key, mesh=None):
        from fhe_regex_tpu.ops.pbs import key_arrays, make_pbs_core

        from fhe_regex_tpu.utils.watchdog import LaunchWatchdog

        self.params = params
        self.mesh = mesh
        self.watchdog = LaunchWatchdog()
        self._dev_key = dev_key
        # the server key rides as jit ARGUMENTS, never as closure constants:
        # a closed-over key becomes an embedded HLO literal and a 362 MB
        # module overflows the remote compiler (HTTP 413 on axon)
        self._key_args = key_arrays(dev_key)
        if mesh is None:
            self._core = make_pbs_core(dev_key)
        else:
            from fhe_regex_tpu.parallel.mesh import make_sharded_pbs_core
            self._core = make_sharded_pbs_core(dev_key, mesh)

    def _affine_combine(self, gathered, lv_in_coefs, lv_consts):
        """sum_k coef_k * slab[slot_k] + const * delta, width-generic.

        gathered [W, 3, n+1] (32-bit) or [W, 3, n+1, 2] (limb pairs)."""
        params = self.params
        if params.torus_bits == 32:
            x = jnp.sum(lv_in_coefs[:, :, None] * gathered, axis=1)
            return x.at[:, -1].add(lv_consts * jnp.int32(params.delta))
        # 64-bit torus: int32 limb pairs with carry-exact arithmetic.
        # All affine coefficients are sign x {1,2,4} (bit_ins scales),
        # so the multiply is a selected static shift + negation.
        from fhe_regex_tpu.ops import pbs64 as p64
        W, _, n1, _ = gathered.shape
        xlo = jnp.zeros((W, n1), jnp.int32)
        xhi = jnp.zeros((W, n1), jnp.int32)
        for i in range(gathered.shape[1]):
            c = lv_in_coefs[:, i][:, None]
            lo, hi = gathered[:, i, :, 0], gathered[:, i, :, 1]
            l1, h1 = p64.shl64(lo, hi, 1)
            l2, h2 = p64.shl64(lo, hi, 2)
            ac = jnp.abs(c)
            plo = jnp.where(ac == 2, l1, jnp.where(ac == 4, l2, lo))
            phi = jnp.where(ac == 2, h1, jnp.where(ac == 4, h2, hi))
            nlo, nhi = p64.neg64(plo, phi)
            plo = jnp.where(c < 0, nlo, plo)
            phi = jnp.where(c < 0, nhi, phi)
            plo = jnp.where(c == 0, 0, plo)
            phi = jnp.where(c == 0, 0, phi)
            xlo, xhi = p64.add64(xlo, xhi, plo, phi)
        delta_shift = params.torus_bits - (
            params.message_bits + params.carry_bits + 1)
        clo, chi = p64.i32_to_64_shifted(lv_consts, delta_shift)
        blo, bhi = p64.add64(xlo[:, -1], xhi[:, -1], clo, chi)
        xlo = xlo.at[:, -1].set(blo)
        xhi = xhi.at[:, -1].set(bhi)
        return jnp.stack([xlo, xhi], axis=-1)

    def _run_level(self, key, slab, luts, lv_in_slots, lv_in_coefs, lv_consts,
                   lv_lut_idx, lv_out_idx):
        gathered = slab[lv_in_slots]                       # [W, 3, n+1(, 2)]
        x = self._affine_combine(gathered, lv_in_coefs, lv_consts)
        outs = self._core(key, luts, jnp.maximum(lv_lut_idx, 0), x)
        return slab.at[lv_out_idx].set(outs)

    @functools.cached_property
    def _level_jit(self):
        return jax.jit(self._run_level, donate_argnums=(1,))

    def _run_level_mv(self, key, slab, vlut, rot_slots, rot_coefs, rot_consts,
                      mv_weights, mv_leader, out_idx, positions):
        """Multi-value level: deduped rotations of the common test poly +
        per-op derived extracts (ops/mv.py).  `positions` is static."""
        gathered = slab[rot_slots]                    # [R, 3, n+1(, 2)]
        x = self._affine_combine(gathered, rot_coefs, rot_consts)
        outs = self._mv_core(key, vlut, mv_weights, mv_leader, x, positions)
        return slab.at[out_idx].set(outs)

    @functools.cached_property
    def _mv_core(self):
        """(key, vlut, weights, leader, rot_cts, positions) -> outputs."""
        if self.mesh is not None:
            from fhe_regex_tpu.parallel.mesh import make_sharded_mv_core
            cache = {}

            def core(key, vlut, weights, leader, rot_cts, positions=None):
                fn = cache.get(positions)
                if fn is None:
                    fn = cache[positions] = make_sharded_mv_core(
                        self._dev_key, self.mesh, positions)
                return fn(key, vlut, weights, leader, rot_cts)

            return core
        from fhe_regex_tpu.ops.mv import make_mv_core
        return make_mv_core(self._dev_key)

    @functools.cached_property
    def _mv_level_jit(self):
        return jax.jit(self._run_level_mv, donate_argnums=(1,),
                       static_argnums=(9,))

    # ---------------- fused-levels megarun ----------------
    #
    # Warm single-match latency on the axon-relayed TPU is dominated by the
    # per-launch dispatch floor (0.15-0.35 s x circuit depth, not compute
    # — docs/BENCHMARKS.md).  Jitting the WHOLE level loop into one XLA
    # program turns depth dispatches into ONE; the inner Mosaic kernels
    # keep their fixed {SMALL, MAX} executable shapes, so the program
    # reuses the already-compiled kernels at every call site.  Per-level
    # plan arrays ride as jit arguments (a pytree), never closures — a
    # closed-over plan would become HLO literals (see __init__ note).

    def _run_levels_fused(self, key, slab, luts, devs):
        for dev in devs:
            slab = self._run_level(key, slab, luts, *dev)
        return slab

    @functools.cached_property
    def _fused_jit(self):
        return jax.jit(self._run_levels_fused, donate_argnums=(1,))

    def _run_levels_fused_mv(self, key, slab, vlut, devs, positions_all):
        for dev, pos in zip(devs, positions_all):
            slab = self._run_level_mv(key, slab, vlut, *dev, pos)
        return slab

    @functools.cached_property
    def _fused_mv_jit(self):
        return jax.jit(self._run_levels_fused_mv, donate_argnums=(1,),
                       static_argnums=(4,))

    def _mv_rotate_many(self, key, slab, vlut, rot_slots, rot_coefs,
                        rot_consts):
        """Phase A of a packed multi-value level: one fixed-shape rotation
        launch (accs returned, not written to the slab)."""
        gathered = slab[rot_slots]
        x = self._affine_combine(gathered, rot_coefs, rot_consts)
        return self._mv_rotate_core(key, vlut, x)

    def _mv_finish_many(self, key, slab, accs, weights, leader, out_idx,
                        positions):
        """Phase B: derived extracts + keyswitch over the level's packed op
        batch (width-flexible XLA work, no Mosaic kernel)."""
        outs = self._mv_finish_core(key, accs, weights, leader, positions)
        return slab.at[out_idx].set(outs)

    @functools.cached_property
    def _mv_rotate_core(self):
        if self.mesh is not None:
            from fhe_regex_tpu.parallel.mesh import make_sharded_mv_rotate_core
            return make_sharded_mv_rotate_core(self._dev_key, self.mesh)
        from fhe_regex_tpu.ops.mv import make_mv_rotate_core
        return make_mv_rotate_core(self._dev_key)

    @functools.cached_property
    def _mv_finish_core(self):
        """(key, accs, weights, leader, positions) -> outputs (positions
        static; the sharded form is built per position set)."""
        if self.mesh is not None:
            from fhe_regex_tpu.parallel.mesh import make_sharded_mv_finish_core
            cache = {}

            def core(key, accs, weights, leader, positions=None):
                fn = cache.get(positions)
                if fn is None:
                    fn = cache[positions] = make_sharded_mv_finish_core(
                        self._dev_key, self.mesh, positions)
                return fn(key, accs, weights, leader)

            return core
        from fhe_regex_tpu.ops.mv import make_mv_finish_core
        return make_mv_finish_core(self._dev_key)

    @functools.cached_property
    def _mv_rotate_many_jit(self):
        return jax.jit(self._mv_rotate_many)

    @functools.cached_property
    def _mv_finish_many_jit(self):
        return jax.jit(self._mv_finish_many, donate_argnums=(1,),
                       static_argnums=(6,))

    @functools.cached_property
    def _dev_vlut(self):
        from fhe_regex_tpu.ops.mv import mv_lut_table
        return jnp.asarray(mv_lut_table(self.params).view(np.int32))

    def _device_luts(self, circuit: "CompiledCircuit"):
        """Device copy of the LUT table, cached on the circuit (uploads once
        per circuit instead of once per match — each host->device transfer
        is a round trip over the axon tunnel)."""
        luts = getattr(circuit, "_dev_luts", None)
        if luts is None:
            luts = jnp.asarray(_np_to_limbs(circuit.luts, self.params.torus_bits))
            circuit._dev_luts = luts
        return luts

    def _device_levels(self, circuit: "CompiledCircuit"):
        """Device copies of every level's plan arrays, cached on the circuit
        (the plans are immutable once compiled)."""
        dl = getattr(circuit, "_dev_levels", None)
        if dl is None:
            if circuit.multivalue:
                dl = [tuple(jnp.asarray(x) for x in
                            (lv.rot_slots, lv.rot_coefs, lv.rot_consts,
                             lv.mv_weights, lv.mv_leader, lv.out_idx))
                      + (lv.mv_positions,)          # static, stays host-side
                      for lv in circuit.levels]
            else:
                dl = [tuple(jnp.asarray(x) for x in
                            (lv.in_slots, lv.in_coefs, lv.consts,
                             lv.lut_idx, lv.out_idx))
                      for lv in circuit.levels]
            circuit._dev_levels = dl
        return dl

    def run(self, circuit: CompiledCircuit, content_blocks: np.ndarray,
            profile: bool = False, checkpoint: "str | None" = None,
            checkpoint_every: int = 0,
            resume: "str | None" = None,
            fuse: "bool | None" = None) -> np.ndarray:
        """content_blocks: [len, num_blocks, n+1] uint32 -> radix result
        [num_blocks, n+1] uint32.

        With profile=True each level is synchronized and timed; per-level
        stats land in ``self.last_run_stats`` (the TPU-side analog of the
        reference's ct-op logging, SURVEY.md §5).

        checkpoint/resume (SURVEY.md §5 — the persistence the reference
        lacks): with ``checkpoint`` + ``checkpoint_every=k``, the slab is
        saved to that path every k levels (and can also be written by a
        crash handler); ``resume=path`` restores a saved slab and continues
        from its recorded level (content_blocks is then ignored — the
        restored slab already contains the encrypted content rows).
        """
        import time

        from fhe_regex_tpu.utils.checkpoint import load_slab, save_slab

        t_run0 = time.time()
        params = self.params
        n1 = params.lwe_dimension + 1
        tb = params.torus_bits
        start_level = 0
        if resume is not None:
            slab_np, start_level = load_slab(resume)
            slab = jnp.asarray(slab_np)
        else:
            shape = (circuit.num_slots, n1) if tb == 32 else (
                circuit.num_slots, n1, 2)
            # build the slab on device: only the content rows cross the host
            # link (the remote-TPU tunnel makes full-slab transfers expensive)
            slab = jnp.zeros(shape, np.int32)
            if content_blocks.size:
                flat = _np_to_limbs(content_blocks.reshape(-1, n1), tb)
                slab = slab.at[1:1 + flat.shape[0]].set(jnp.asarray(flat))
        mv = circuit.multivalue
        luts = self._dev_vlut if mv else self._device_luts(circuit)
        level_jit = self._mv_level_jit if mv else self._level_jit
        stats = []
        devs = self._device_levels(circuit)
        if fuse is None:
            fuse = default_fuse(circuit)
        if (fuse and start_level == 0 and not profile
                and not (checkpoint is not None and checkpoint_every > 0)):
            # one dispatch for the whole circuit (per-level path retained
            # for profile/checkpoint, which need level boundaries)
            if mv:
                slab = self._fused_mv_jit(
                    self._key_args, slab, luts,
                    tuple(d[:-1] for d in devs), tuple(d[-1] for d in devs))
            else:
                slab = self._fused_jit(self._key_args, slab, luts,
                                       tuple(devs))
            self.last_run_stats = []
            out = self._finalize(circuit, slab)
            # watchdog on the fused dispatch (the round-3 1694 s anomaly
            # was exactly this path): _finalize's host transfer blocks on
            # the whole megarun, so the elapsed time is the real cost
            self.watchdog.observe(
                ("fused", circuit.pbs_count, circuit.num_slots, mv),
                time.time() - t_run0)
            return out
        for li in range(start_level, len(circuit.levels)):
            lv, dev = circuit.levels[li], devs[li]
            t0 = time.time() if profile else 0.0
            slab = level_jit(self._key_args, slab, luts, *dev)
            if profile:
                slab.block_until_ready()
                stat = {"width": int(lv.lut_idx.shape[0]),
                        "active": int((lv.lut_idx >= 0).sum()),
                        "seconds": time.time() - t0}
                if mv:
                    stat["rotations"] = int(lv.rot_slots.shape[0])
                stats.append(stat)
            if (checkpoint is not None and checkpoint_every > 0
                    and (li + 1) % checkpoint_every == 0
                    and li + 1 < len(circuit.levels)):
                save_slab(checkpoint, np.asarray(slab), li + 1)
        self.last_run_stats = stats
        if profile:
            # failure-probability contract for this run, at THIS key's
            # actual operating point (mv norm + the prepared key's drop)
            self.last_run_pfail = circuit_pfail(
                params, circuit, bsk_drop=_dev_key_drop(self._dev_key))
        out = self._finalize(circuit, slab)
        self.watchdog.observe(
            ("levels", circuit.pbs_count, circuit.num_slots, mv),
            time.time() - t_run0)
        return out

    def _device_chunks_many(self, circuit: "CompiledCircuit", C: int,
                            wide_batch: bool):
        """Packed, padded, chunked run_many launch plans as device arrays,
        cached on the circuit per (C, wide_batch) — steady-state serving
        re-runs the same plan, so the packing + tunnel uploads happen once.
        """
        cache = getattr(circuit, "_dev_chunks", None)
        if cache is None:
            cache = {}
            circuit._dev_chunks = cache
        key = (C, bool(wide_batch))
        if key in cache:
            return cache[key]
        S = circuit.num_slots
        offs = (np.arange(C, dtype=np.int32) * S)[:, None]
        chunks = []
        for lv in circuit.levels:
            # pack only the ACTIVE ops of the level across contents (the
            # compiled level is padded to a fixed launch width — tiling the
            # padding C times would multiply launches by the padding factor)
            act = lv.lut_idx >= 0
            a_slots, a_coefs = lv.in_slots[act], lv.in_coefs[act]
            a_consts, a_lut, a_out = (lv.consts[act], lv.lut_idx[act],
                                      lv.out_idx[act])
            # per-content slot offsets; coef-0 inputs keep gathering slot 0
            # (the reserved zero ct) in every content's slab segment
            in_slots = np.where(a_coefs[None] != 0,
                                a_slots[None] + offs[:, None], 0)
            t_slots = in_slots.reshape(-1, 3)
            t_coefs = np.broadcast_to(a_coefs,
                                      (C,) + a_coefs.shape).reshape(-1, 3)
            t_consts = np.broadcast_to(a_consts,
                                       (C,) + a_consts.shape).reshape(-1)
            t_lut = np.broadcast_to(a_lut, (C,) + a_lut.shape).reshape(-1)
            t_out = (a_out[None] + offs).reshape(-1)
            # the flattened batch C*W may exceed what one kernel launch
            # handles in VMEM — chunk it over the fixed executable shapes
            # ({WIDE,} MAX, SMALL; padded rows gather slot 0 and write the
            # trash slot) so every launch reuses a compiled executable
            total = t_out.shape[0]
            sizes = _chunk_sizes(total, wide_batch)
            pad = sum(sizes) - total
            if pad:
                t_slots = np.concatenate([t_slots, np.zeros((pad, 3), np.int32)])
                t_coefs = np.concatenate([t_coefs, np.zeros((pad, 3), np.int32)])
                t_consts = np.concatenate([t_consts, np.zeros(pad, np.int32)])
                t_lut = np.concatenate([t_lut, np.full(pad, -1, np.int32)])
                t_out = np.concatenate(
                    [t_out, np.full(pad, S - 1, np.int32)])
            c0 = 0
            for w in sizes:
                sl = slice(c0, c0 + w)
                c0 += w
                chunks.append(tuple(jnp.asarray(x) for x in
                                    (t_slots[sl], t_coefs[sl], t_consts[sl],
                                     t_lut[sl], t_out[sl])))
        cache[key] = chunks
        return chunks

    @staticmethod
    def _mv_pad_rows(n: int) -> int:
        """Bounded shape set for packed mv arrays: {64, 256, multiples of
        1024} — keeps the number of distinct XLA executables small."""
        for b in (64, 256, 1024):
            if n <= b:
                return b
        return -(-n // 1024) * 1024

    # accumulator-buffer bound for packed multivalue levels: 4096 rows of
    # (k+1)*N int32 = 64 MB (halved at 64 bits, where rows are limb PAIRS,
    # to keep the same byte bound).  Compiled level plans hold <=
    # MAX_LEVEL_BATCH rotations, so every content group spans >= 8 contents.
    MAX_MV_ACC_ROWS = 4096

    @property
    def _mv_acc_rows_cap(self) -> int:
        return (self.MAX_MV_ACC_ROWS if self.params.torus_bits == 32
                else self.MAX_MV_ACC_ROWS // 2)

    def _device_chunks_many_mv(self, circuit: "CompiledCircuit", C: int,
                               wide_batch: bool):
        """Packed run_many plan for a multivalue circuit.

        Per (level, content group): rotation chunks in the fixed kernel
        shapes (phase A) and the packed derived-extract arrays (phase B).
        Leaders index the CONCATENATION of the group's chunk outputs, so
        actives are laid out contiguously before the tail padding.
        Contents are independent, so each level is split into groups of at
        most MAX_MV_ACC_ROWS rotations — device memory stays bounded like
        the classic chunked path."""
        cache = getattr(circuit, "_dev_chunks_mv", None)
        if cache is None:
            cache = {}
            circuit._dev_chunks_mv = cache
        key = (C, bool(wide_batch))
        if key in cache:
            return cache[key]
        S = circuit.num_slots
        plans = []
        for lv in circuit.levels:
            act = lv.lut_idx >= 0
            R = lv.mv_rot_count
            group = max(1, min(C, self._mv_acc_rows_cap // max(1, R)))
            a_w = lv.mv_weights[act]
            a_ld = lv.mv_leader[act]
            a_out = lv.out_idx[act]
            r_slots = lv.rot_slots[:R]
            r_coefs = lv.rot_coefs[:R]
            r_consts = lv.rot_consts[:R]
            for g0 in range(0, C, group):
                g = min(group, C - g0)
                offs = ((np.arange(g0, g0 + g, dtype=np.int32) * S)[:, None])
                # --- phase A: rotations tiled per content, fixed-shape chunks
                t_rs = np.where(r_coefs[None] != 0,
                                r_slots[None] + offs[:, None], 0).reshape(-1, 3)
                t_rc = np.broadcast_to(r_coefs,
                                       (g,) + r_coefs.shape).reshape(-1, 3)
                t_rk = np.broadcast_to(r_consts,
                                       (g,) + r_consts.shape).reshape(-1)
                total_rot = g * R
                sizes = _chunk_sizes(total_rot, wide_batch)
                pad = sum(sizes) - total_rot
                if pad:
                    t_rs = np.concatenate([t_rs, np.zeros((pad, 3), np.int32)])
                    t_rc = np.concatenate([t_rc, np.zeros((pad, 3), np.int32)])
                    t_rk = np.concatenate([t_rk, np.zeros(pad, np.int32)])
                rot_chunks = []
                c0 = 0
                for w in sizes:
                    sl = slice(c0, c0 + w)
                    c0 += w
                    rot_chunks.append(tuple(jnp.asarray(x) for x in
                                            (t_rs[sl], t_rc[sl], t_rk[sl])))
                acc_rows = self._mv_pad_rows(sum(sizes))
                # --- phase B: packed ops; leader of (content c, op leader r)
                # is (c - g0)*R + r (actives contiguous in the chunk concat)
                t_w = np.broadcast_to(a_w, (g,) + a_w.shape).reshape(
                    -1, a_w.shape[1])
                t_ld = (a_ld[None]
                        + (np.arange(g, dtype=np.int32) * R)[:, None]
                        ).reshape(-1)
                t_out = (a_out[None] + offs).reshape(-1)
                wb = self._mv_pad_rows(t_out.shape[0])
                padb = wb - t_out.shape[0]
                if padb:
                    t_w = np.concatenate([t_w, np.zeros((padb, t_w.shape[1]),
                                                        np.int32)])
                    t_ld = np.concatenate([t_ld, np.zeros(padb, np.int32)])
                    t_out = np.concatenate([t_out, np.full(padb, S * C - 1,
                                                           np.int32)])
                fin = (tuple(jnp.asarray(x) for x in (t_w, t_ld, t_out))
                       + (lv.mv_positions,))
                plans.append((rot_chunks, acc_rows, fin))
        cache[key] = plans
        return plans

    def run_many(self, circuit: CompiledCircuit, contents: np.ndarray,
                 wide_batch: "bool | None" = None,
                 checkpoint: "str | None" = None,
                 checkpoint_every: int = 0,
                 resume: "str | None" = None) -> np.ndarray:
        """Match ONE compiled pattern against MANY encrypted contents.

        contents: [C, len, num_blocks, n+1] uint32 -> [C, num_blocks, n+1].

        The serving fast path: all C contents share the circuit, so every
        level's bootstrap batch is C x width — far better MXU utilization
        than C separate runs (levels amortize across contents).

        wide_batch adds a third WIDE_LEVEL_BATCH-wide launch shape for big
        packed levels (default: on for TPU, off elsewhere; env override
        FHE_REGEX_WIDE_BATCH=0|1).  Costs one extra Mosaic executable per
        process, then large levels run at the kernel's B>=1024 throughput.

        checkpoint/resume (VERDICT r4 weak #7 — the serving path is where
        a long batch is most worth resuming): with ``checkpoint`` +
        ``checkpoint_every=k``, the packed slab is saved every k launch
        steps (a step = one classic chunk launch, or one multivalue
        rotations+finish plan entry).  ``resume=path`` restores a saved
        slab and replays only the remaining steps; the call must pass the
        SAME circuit, contents count, and wide_batch as the checkpointing
        run (the launch plan is deterministic in those — validated against
        the recorded step count).  `contents` is then ignored beyond its
        shape: the restored slab already holds the encrypted rows.
        """
        import os

        from fhe_regex_tpu.utils.checkpoint import (load_many_slab,
                                                    save_many_slab)

        if wide_batch is None:
            env = os.environ.get("FHE_REGEX_WIDE_BATCH")
            wide_batch = (env == "1" if env is not None
                          else jax.default_backend() == "tpu")
        params = self.params
        C = contents.shape[0]
        n1 = params.lwe_dimension + 1
        tb = params.torus_bits
        S = circuit.num_slots
        start_step = 0
        if resume is not None:
            slab_np, start_step, ck_C, ck_total = load_many_slab(resume)
            if ck_C != C:
                raise ValueError(
                    f"resume checkpoint was taken at C={ck_C} contents, "
                    f"got C={C} — the packed plan does not match")
            slab = jnp.asarray(slab_np)
        else:
            shape = (C * S, n1) if tb == 32 else (C * S, n1, 2)
            # device-side slab build: upload only the content rows, not
            # C*S slots
            slab = jnp.zeros(shape, np.int32)
            if contents.size:
                flat = _np_to_limbs(contents.reshape(C, -1, n1), tb)
                L = flat.shape[1]
                rows = (np.arange(C, dtype=np.int32)[:, None] * S + 1
                        + np.arange(L, dtype=np.int32)[None, :]).reshape(-1)
                slab = slab.at[jnp.asarray(rows)].set(
                    jnp.asarray(flat.reshape(C * L, *flat.shape[2:])))

        def _maybe_ckpt(step, total):
            if (checkpoint is not None and checkpoint_every > 0
                    and step % checkpoint_every == 0 and step < total):
                save_many_slab(checkpoint, np.asarray(slab), step, C, total)

        if circuit.multivalue:
            k1N = (params.glwe_dimension + 1, params.polynomial_size)
            if tb != 32:
                k1N = k1N + (2,)
            vlut = self._dev_vlut
            plans = self._device_chunks_many_mv(circuit, C, wide_batch)
            if resume is not None and ck_total != len(plans):
                raise ValueError(
                    f"resume checkpoint recorded {ck_total} steps, this "
                    f"plan has {len(plans)} — circuit/wide_batch mismatch")
            for si in range(start_step, len(plans)):
                rot_chunks, acc_rows, fin = plans[si]
                accs = [self._mv_rotate_many_jit(self._key_args, slab, vlut,
                                                 *ch)
                        for ch in rot_chunks]
                got = sum(a.shape[0] for a in accs)
                if got < acc_rows:
                    accs.append(jnp.zeros((acc_rows - got,) + k1N, jnp.int32))
                acc = accs[0] if len(accs) == 1 else jnp.concatenate(accs)
                slab = self._mv_finish_many_jit(self._key_args, slab, acc,
                                                *fin)
                _maybe_ckpt(si + 1, len(plans))
        else:
            luts = self._device_luts(circuit)
            chunks = self._device_chunks_many(circuit, C, wide_batch)
            if resume is not None and ck_total != len(chunks):
                raise ValueError(
                    f"resume checkpoint recorded {ck_total} steps, this "
                    f"plan has {len(chunks)} — circuit/wide_batch mismatch")
            for si in range(start_step, len(chunks)):
                slab = self._level_jit(self._key_args, slab, luts,
                                       *chunks[si])
                _maybe_ckpt(si + 1, len(chunks))
        dt = U32 if tb == 32 else np.uint64
        roots = circuit.all_roots
        R = len(roots)
        out = np.zeros((C, R, params.num_blocks, n1), dt)
        # download ONLY the C x (non-const roots) rows, not the C*S-slot slab
        slots = [r.val.slot for r in roots if r.val.sign != 0]
        if slots:
            ridx = (np.arange(C, dtype=np.int32)[:, None] * S
                    + np.asarray(slots, np.int32)[None, :]).reshape(-1)
            rows = np.asarray(slab[jnp.asarray(ridx)]).reshape(
                (C, len(slots)) + slab.shape[1:])
        for ci in range(C):
            ri = 0
            for pi, r in enumerate(roots):
                val = r.val
                if val.sign == 0:
                    out[ci, pi] = _assemble_root(params, val, None)
                else:
                    out[ci, pi] = _assemble_root(
                        params, val, _limbs_to_np(rows[ci, ri], tb))
                    ri += 1
        return out[:, 0] if circuit.roots is None else out

    def _finalize(self, circuit: CompiledCircuit, slab) -> np.ndarray:
        """Single root -> [num_blocks, n+1]; multi-root -> [R, num_blocks, n+1].

        Only the root rows are downloaded (one gather), never the slab."""
        params = self.params
        roots = circuit.all_roots
        slots = [r.val.slot for r in roots if r.val.sign != 0]
        rows = (np.asarray(slab[jnp.asarray(np.asarray(slots, np.int32))])
                if slots else None)
        outs, ri = [], 0
        for r in roots:
            val: BitVal = r.val
            if val.sign == 0:
                outs.append(_assemble_root(params, val, None))
            else:
                ct_u = _limbs_to_np(rows[ri], params.torus_bits)
                ri += 1
                outs.append(_assemble_root(params, val, ct_u))
        return outs[0] if circuit.roots is None else np.stack(outs)
