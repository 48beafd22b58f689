"""Multi-chip scale-out over a device mesh.

The reference has no distributed tier (SURVEY.md §2.9); its concurrency is
one OS audio thread. The TPU framework scales the STREAM axis across chips:
per-stream DSP is embarrassingly parallel, so states shard over a 1-D
``("streams",)`` mesh and the whole block step runs SPMD under jit — the
only collective is the final `psum` when a mix graph spans chips (the
cross-chip analog of src/mixer.rs:185-198), riding ICI.

Long audio is handled by STREAMING (O(1) state per effect, time scanned,
never sharded) — the same answer the reference gives for unbounded
sequences, at block granularity.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.node import Node, State
from .batch import BatchedChain


def stream_mesh(devices: Optional[Sequence] = None, axis: str = "streams") -> Mesh:
    """1-D mesh over all (or given) devices, stream axis."""
    devices = list(devices) if devices is not None else jax.devices()
    return Mesh(np.array(devices), (axis,))


def hybrid_stream_mesh(n_hosts: int, devices: Optional[Sequence] = None,
                       axes=("dcn", "streams")) -> Mesh:
    """2-D mesh for multi-host stream farms: outer axis across hosts
    (DCN), inner axis over each host's chips (ICI).

    The stream axis shards over BOTH axes (``P(("dcn", "streams"))``), so
    per-stream DSP stays embarrassingly parallel; the only cross-host
    traffic is the final mix ``psum`` over the axis pair, which XLA
    reduces hierarchically — the [C, T] partial mixes reduce over ICI
    first, and only one tiny [C, T] block (~33 KB at T=4160) crosses DCN
    per step. (Scaling-book recipe: lay out shardings so the heavy
    collectives ride ICI, not DCN.)

    On a real multi-host runtime the mesh comes from
    ``mesh_utils.create_hybrid_device_mesh`` (groups each host's chips on
    the inner axis, DCN-connected hosts on the outer); in a single
    process the devices are reshaped ``[n_hosts, -1]`` so the same SPMD
    program is testable on virtual devices.
    """
    devices = list(devices) if devices is not None else jax.devices()
    if len(devices) % n_hosts:
        raise ValueError(f"{len(devices)} devices not divisible by "
                         f"{n_hosts} hosts")
    per_host = len(devices) // n_hosts
    n_proc = len({d.process_index for d in devices})
    if n_proc > 1:
        from jax.experimental import mesh_utils

        dm = mesh_utils.create_hybrid_device_mesh(
            (1, per_host), (n_hosts, 1), devices=devices
        )
        return Mesh(dm, axes)
    return Mesh(np.array(devices).reshape(n_hosts, per_host), axes)


def _axes_tuple(axis) -> tuple:
    return (axis,) if isinstance(axis, str) else tuple(axis)


def _lead_spec(axes: tuple) -> object:
    """PartitionSpec leading element sharding over one or several mesh
    axes (a tuple element shards the dim over the axis product)."""
    return axes[0] if len(axes) == 1 else axes


def shard_batched_state(state: State, mesh: Mesh, axis="streams") -> State:
    """Place a stacked per-stream state onto the mesh, sharded on the leading
    stream axis (over one mesh axis, or several for a hybrid mesh)."""
    lead = _lead_spec(_axes_tuple(axis))

    def put(x):
        spec = P(lead, *([None] * (x.ndim - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(put, state)


class ShardedMixer(Node):
    """Cross-chip mixer: shard the stream axis, emit locally, psum the mix.

    Built on `shard_map` so the per-chip body is explicit SPMD: each chip
    vmaps its local streams, reduces locally, and one `psum` over the stream
    axis of the mesh produces the global [C, T] mix on every chip.
    """

    def __init__(self, chain: BatchedChain, mesh: Mesh, axis="streams"):
        self.chain = chain
        self.mesh = mesh
        self.axis = _axes_tuple(axis)
        self.spec = chain.spec

    def total_frames(self) -> Optional[int]:
        return None

    def init_state(self) -> State:
        return shard_batched_state(self.chain.state, self.mesh, self.axis)

    def emit(self, state: State, n: int):
        template = self.chain.template
        axis = self.axis

        def per_chip(local_state):
            st, blocks, valids = jax.vmap(
                lambda s: template.emit(s, n)
            )(local_state)
            local_sum = jnp.sum(blocks, axis=0)
            total = jax.lax.psum(local_sum, axis)
            max_valid = jax.lax.pmax(jnp.max(valids, initial=0), axis)
            return st, total, max_valid

        from jax.experimental.shard_map import shard_map

        lead = _lead_spec(self.axis)
        state_specs = jax.tree_util.tree_map(
            lambda x: P(lead, *([None] * (x.ndim - 1))), state
        )
        fn = shard_map(
            per_chip,
            mesh=self.mesh,
            in_specs=(state_specs,),
            out_specs=(state_specs, P(), P()),
        )
        return fn(state)


class ShardedBatch:
    """Sharded S-stream batch WITHOUT mixing: each chip renders its local
    streams; outputs stay sharded [S, C, T] (no collectives at all)."""

    def __init__(self, chain: BatchedChain, mesh: Mesh, axis: str = "streams"):
        self.chain = chain
        self.mesh = mesh
        self.axis = axis
        self._steps = {}  # block size -> jitted step (no per-call retrace)

    def init_state(self) -> State:
        return shard_batched_state(self.chain.state, self.mesh, self.axis)

    def emit(self, state: State, n: int):
        step = self._steps.get(n)
        if step is None:
            step = jax.jit(lambda st: self.chain.emit(st, n))
            self._steps[n] = step
        return step(state)


class _BlockFeed:
    """In-graph source whose block arrives through its state — lets a
    stateful wrapper node (e.g. the master Limit) process an
    already-computed block inside a larger traced program."""

    def __init__(self, channels: int, sample_rate: int):
        from ..core.types import StreamSpec

        self.spec = StreamSpec(channels, sample_rate)

    def total_frames(self):
        return None

    def init_state(self) -> State:
        return {}

    def emit(self, state: State, n: int):
        return {}, state["blk"][:, :n], state["v"]


class ShardedWidePipeline:
    """The FULL wide-channel flagship chain sharded over a device mesh.

    ``build(n_streams) -> Node`` must construct the per-stream chain in the
    wide-channel layout ending in a stream-axis mix (output [C, T]) with
    ALL per-stream variation in the state pytree (data buffers, gains,
    filter/AGC/limiter carries — the framework convention). The same
    builder then yields:

    - the GLOBAL chain (S streams) whose ``init_state`` supplies the full
      state, placed sharded: every leaf whose leading axis is per-stream
      (detected by comparing global vs local leaf shapes) splits across
      the mesh; scalars and master-bus state replicate;
    - the LOCAL template (S / n_devices streams) traced per chip inside
      ``shard_map``.

    Each block step is ONE jitted SPMD program, built once per block size
    (no per-call retrace): local chain emit -> per-chip partial mix ->
    ``psum`` over ICI -> master limiter computed INSIDE the shard_map on
    the replicated mix (its state carried replicated) — the multi-chip
    analog of the flagship's mix+master-limit stack
    (src/mixer.rs:185-198 + src/source/limit.rs).
    """

    def __init__(self, build, n_streams: int, mesh: Mesh,
                 axis="streams", master_settings=None):
        from ..effects.limit import Limit, LimitSettings

        self.mesh = mesh
        self.axis = _axes_tuple(axis)
        n_dev = int(np.prod([mesh.shape[a] for a in self.axis]))
        if n_streams % n_dev:
            raise ValueError(
                f"{n_streams} streams not divisible by {n_dev} devices"
            )
        self.n_streams = n_streams
        self.global_chain = build(n_streams)
        self.local_chain = build(n_streams // n_dev)
        self.spec = self.global_chain.spec
        assert self.local_chain.spec.channels == self.spec.channels, (
            "builder must end in a stream-axis mix (output [C, T])"
        )
        feed = _BlockFeed(self.spec.channels, self.spec.sample_rate)
        self.master = Limit(
            feed, master_settings or LimitSettings(), mode="exact"
        )
        # leaf-wise specs: sharded where the global leaf's leading axis
        # scales with the stream count, replicated where it doesn't
        g_leaves, self._treedef = jax.tree_util.tree_flatten(
            self.global_chain.init_state()
        )
        l_leaves = jax.tree_util.tree_leaves(self.local_chain.init_state())
        assert len(g_leaves) == len(l_leaves), (
            "builder must produce shape-compatible states at any S"
        )
        lead = _lead_spec(self.axis)
        self._chain_specs = jax.tree_util.tree_unflatten(
            self._treedef,
            [
                P(lead, *([None] * (g.ndim - 1)))
                if g.shape != l.shape else P()
                for g, l in zip(g_leaves, l_leaves)
            ],
        )
        self._steps = {}

    def init_state(self) -> State:
        def put(x, spec):
            return jax.device_put(x, NamedSharding(self.mesh, spec))

        chain = jax.tree_util.tree_map(
            put, self.global_chain.init_state(), self._chain_specs
        )
        rep = NamedSharding(self.mesh, P())
        master = jax.tree_util.tree_map(
            lambda x: jax.device_put(jnp.asarray(x), rep),
            self.master.init_state(),
        )
        return {"chain": chain, "master": master}

    def _build_step(self, n: int):
        axis = self.axis
        local = self.local_chain
        master = self.master

        def per_chip(chain_state, master_state):
            st, part, valid = local.emit(chain_state, n)
            mix = jax.lax.psum(part, axis)
            valid = jax.lax.pmax(valid, axis)
            mst, out, v = master.emit(
                {**master_state, "in": {"blk": mix, "v": valid}}, n
            )
            mst = {**mst, "in": {}}  # keep the replicated-state treedef
            return st, mst, out, v

        from jax.experimental.shard_map import shard_map

        rep_specs = jax.tree_util.tree_map(
            lambda _: P(), self.master.init_state()
        )
        fn = shard_map(
            per_chip,
            mesh=self.mesh,
            in_specs=(self._chain_specs, rep_specs),
            out_specs=(self._chain_specs, rep_specs, P(), P()),
            check_rep=False,
        )
        return jax.jit(fn)

    def emit(self, state: State, n: int):
        step = self._steps.get(n)
        if step is None:
            step = self._build_step(n)
            self._steps[n] = step
        mst_in = dict(state["master"])
        mst_in["in"] = {}
        chain, mst, out, v = step(state["chain"], mst_in)
        return {"chain": chain, "master": mst}, out, v


class ShardedFusedPipeline:
    """The fused MEGA-KERNEL sharded over a device mesh — the flagship
    perf path at multi-chip scale (VERDICT r3 #1).

    ``build(n_local_streams, shard) -> Node`` constructs one chip's
    fused pipeline (a :class:`~rodio_tpu.flagship.FusedWidePipeline`,
    or any node whose ``emit`` yields that chip's PARTIAL stream mix
    [C, T]); ``shard`` selects that chip's slice of the global content.
    All shards must be structurally identical (same rates / kernel
    config) — only state CONTENT may differ.

    Layout: the per-shard states stack on a leading device axis sharded
    1-per-chip over the mesh, so inside ``shard_map`` each chip sees
    exactly its own fused state, runs the Pallas mega-kernel on its
    local streams, and ONE ``psum`` over ICI produces the global mix
    (the cross-chip analog of src/mixer.rs:185-198) — the master-bus
    limiter then runs in-shard on the replicated mix, exactly like the
    single-chip flagship's mix+master stack. Per-block cross-chip
    traffic is the [C, T] partial mix only (~33 KB at T=4160).

    Works on a 1-D ``("streams",)`` mesh or the hybrid
    ``("dcn", "streams")`` multi-host mesh (psum over the axis pair →
    hierarchical reduce: ICI partials first, one block over DCN).
    """

    def __init__(self, build, n_streams: int, mesh: Mesh,
                 axis="streams", master_settings=None,
                 master_mode: str = "auto"):
        from ..effects.limit import Limit, LimitSettings

        self.mesh = mesh
        self.axis = _axes_tuple(axis)
        n_dev = int(np.prod([mesh.shape[a] for a in self.axis]))
        if n_streams % n_dev:
            raise ValueError(
                f"{n_streams} streams not divisible by {n_dev} devices"
            )
        self.n_streams = n_streams
        self.n_dev = n_dev
        s_local = n_streams // n_dev
        self._locals = [build(s_local, d) for d in range(n_dev)]
        self.template = self._locals[0]
        self.spec = self.template.spec
        # structural identity across shards: same treedef, leaf shapes
        states = [p.init_state() for p in self._locals]
        leaves0, self._treedef = jax.tree_util.tree_flatten(states[0])
        for st in states[1:]:
            lv, td = jax.tree_util.tree_flatten(st)
            assert td == self._treedef and all(
                a.shape == b.shape and a.dtype == b.dtype
                for a, b in zip(lv, leaves0)
            ), "shards must be structurally identical"
        self._init_states = states
        feed = _BlockFeed(self.spec.channels, self.spec.sample_rate)
        self.master = Limit(
            feed, master_settings or LimitSettings(), mode=master_mode
        )
        lead = _lead_spec(self.axis)
        self._chain_specs = jax.tree_util.tree_map(
            lambda x: P(lead, *([None] * np.ndim(x))), states[0]
        )
        self._steps = {}

    def init_state(self) -> State:
        def put(xs, spec):
            return jax.device_put(
                jnp.stack([jnp.asarray(x) for x in xs]),
                NamedSharding(self.mesh, spec),
            )

        chain = jax.tree_util.tree_map(
            put,
            jax.tree_util.tree_map(lambda *xs: list(xs), *self._init_states),
            self._chain_specs,
            is_leaf=lambda x: isinstance(x, list),
        )
        rep = NamedSharding(self.mesh, P())
        master = jax.tree_util.tree_map(
            lambda x: jax.device_put(jnp.asarray(x), rep),
            self.master.init_state(),
        )
        return {"chain": chain, "master": master}

    def _replicate_chain_update(self, state: State, update: State) -> State:
        """Swap shard-identical fields (coeffs / derived operator / AGC
        knobs) into every shard of the stacked chain state: live retune
        at multi-chip scale, zero re-trace."""
        lead = _lead_spec(self.axis)

        def bcast(x):
            x = jnp.asarray(x)
            return jax.device_put(
                jnp.broadcast_to(x[None], (self.n_dev,) + x.shape),
                NamedSharding(self.mesh, P(lead, *([None] * x.ndim))),
            )

        chain = dict(state["chain"])
        for k, v in update.items():
            chain[k] = jax.tree_util.tree_map(bcast, v)
        return {**state, "chain": chain}

    def retune(self, state: State, **kw) -> State:
        """Live biquad retune on every shard (src/source/blt.rs:68-91):
        recompute coeffs + derived operator host-side once, broadcast
        into the sharded state — no recompile, no resharding."""
        one = self.template.retune(self._init_states[0], **kw)
        return self._replicate_chain_update(
            state, {"coeffs": one["coeffs"], "op": one["op"]}
        )

    def set_agc_params(self, state: State, **kw) -> State:
        assert getattr(self.template, "with_agc", False)
        # template.set_agc_params reads state["agc_par"]; feed it shard
        # 0's current values from the stacked state
        cur = {**self._init_states[0],
               "agc_par": jax.device_get(state["chain"]["agc_par"])[0]}
        one = self.template.set_agc_params(cur, **kw)
        return self._replicate_chain_update(
            state, {"agc_par": one["agc_par"]}
        )

    def _build_step(self, n: int):
        axis = self.axis
        local = self.template
        master = self.master

        def per_chip(chain_state, master_state):
            cs = jax.tree_util.tree_map(lambda x: x[0], chain_state)
            cs, part, valid = local.emit(cs, n)
            mix = jax.lax.psum(part, axis)
            valid = jax.lax.pmax(valid, axis)
            mst, out, v = master.emit(
                {**master_state, "in": {"blk": mix, "v": valid}}, n
            )
            mst = {**mst, "in": {}}
            return (
                jax.tree_util.tree_map(lambda x: x[None], cs),
                mst, out, v,
            )

        from jax.experimental.shard_map import shard_map

        rep_specs = jax.tree_util.tree_map(
            lambda _: P(), self.master.init_state()
        )
        fn = shard_map(
            per_chip,
            mesh=self.mesh,
            in_specs=(self._chain_specs, rep_specs),
            out_specs=(self._chain_specs, rep_specs, P(), P()),
            check_rep=False,
        )
        return jax.jit(fn)

    def emit(self, state: State, n: int):
        step = self._steps.get(n)
        if step is None:
            step = self._build_step(n)
            self._steps[n] = step
        mst_in = dict(state["master"])
        mst_in["in"] = {}
        chain, mst, out, v = step(state["chain"], mst_in)
        return {"chain": chain, "master": mst}, out, v
