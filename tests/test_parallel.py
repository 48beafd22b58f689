"""Multi-chip sharding correctness on the virtual 8-device CPU mesh.

The stream axis shards over a 1-D mesh; the cross-chip mix is a psum over
ICI. These tests verify the sharded results equal the unsharded ones.
"""
import jax
import numpy as np
import pytest

from rodio_tpu.effects.basic import Amplify
from rodio_tpu.parallel.batch import BatchedChain, BatchedMixer, stack_states
from rodio_tpu.parallel.sharding import ShardedMixer, stream_mesh
from rodio_tpu.sources.generators import SamplesBuffer


@pytest.fixture
def mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return stream_mesh(jax.devices()[:8])


def _build_chain(rng, n_streams, frames=2000):
    datas = [
        rng.uniform(-1, 1, (2, frames)).astype(np.float32)
        for _ in range(n_streams)
    ]
    template = Amplify(SamplesBuffer(2, 48000, datas[0]), 1.0 / n_streams)
    states = []
    for d in datas:
        node = Amplify(SamplesBuffer(2, 48000, d), 1.0 / n_streams)
        states.append(node.init_state())
    return template, stack_states(states), datas


def test_sharded_mixer_equals_dense_sum(rng, mesh):
    n_streams = 16
    template, stacked, datas = _build_chain(rng, n_streams)
    chain = BatchedChain(template, stacked, n_streams)

    sharded = ShardedMixer(chain, mesh)
    state = sharded.init_state()
    state, mix, valid = jax.jit(lambda s: sharded.emit(s, 256))(state)

    expected = sum(d[:, :256] for d in datas) / n_streams
    np.testing.assert_allclose(np.asarray(mix), expected, atol=1e-6)
    assert int(valid) == 256


def test_sharded_mixer_streams_stay_sharded(rng, mesh):
    """State stays distributed: each leaf's leading axis is sharded over
    the mesh, so per-chip work is S/n_devices streams."""
    n_streams = 16
    template, stacked, _ = _build_chain(rng, n_streams)
    chain = BatchedChain(template, stacked, n_streams)
    sharded = ShardedMixer(chain, mesh)
    state = sharded.init_state()
    leaf = jax.tree_util.tree_leaves(state)[0]
    assert len(leaf.sharding.device_set) == 8

    # a second block continues from the sharded state without resharding
    step = jax.jit(lambda s: sharded.emit(s, 128))
    state2, mix1, _ = step(state)
    state3, mix2, _ = step(state2)
    leaf2 = jax.tree_util.tree_leaves(state3)[0]
    assert len(leaf2.sharding.device_set) == 8


def test_batched_mixer_matches_wide_layout(rng):
    """The vmapped batch and the wide-channel layout agree."""
    from rodio_tpu.parallel.batch import WideMixer

    n_streams, frames = 4, 1000
    datas = [
        rng.uniform(-1, 1, (2, frames)).astype(np.float32)
        for _ in range(n_streams)
    ]
    # vmapped path
    template = SamplesBuffer(2, 48000, datas[0])
    states = [SamplesBuffer(2, 48000, d).init_state() for d in datas]
    vm = BatchedMixer(BatchedChain(template, stack_states(states), n_streams))
    s, out_vm, v = jax.jit(lambda s: vm.emit(s, 256))(vm.init_state())

    # wide path
    wide = np.concatenate(datas, axis=0)
    wnode = WideMixer(SamplesBuffer(2 * n_streams, 48000, wide), n_streams)
    s, out_w, v = jax.jit(lambda s: wnode.emit(s, 256))(wnode.init_state())

    np.testing.assert_allclose(np.asarray(out_vm), np.asarray(out_w),
                               atol=1e-6)
