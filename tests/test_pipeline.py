"""BatchLoader tests: ordering, shuffling, static shapes, FLAC fast path."""

import numpy as np
import pytest

from sls_tpu.data.pipeline import ArrayLoader, BatchLoader, DatasetIndex
from tests.flac_encoder import encode_flac


@pytest.fixture
def flac_dataset(tmp_path):
    flac_dir = tmp_path / "flac"
    flac_dir.mkdir()
    utts, labels = [], {}
    rng = np.random.default_rng(0)
    for i in range(10):
        utt = f"U_{i:03d}"
        samples = np.full(500 + 100 * i, 1000 + i, np.int64)
        (flac_dir / f"{utt}.flac").write_bytes(
            encode_flac([samples], mode="constant")
        )
        utts.append(utt)
        labels[utt] = i % 2
    return tmp_path, utts, labels


def test_loader_order_and_labels(flac_dataset):
    base, utts, labels = flac_dataset
    index = DatasetIndex.for_train(utts, labels, base)
    loader = BatchLoader(index, batch_size=4, cut=800, num_threads=3)
    batches = list(loader.epoch(0))
    assert len(batches) == 3
    # order preserved without shuffle
    assert batches[0].utt_ids[:4] == utts[:4]
    # constant value identifies the right file
    assert batches[0].wav[0, 0] == pytest.approx((1000) / 32768.0, abs=1e-6)
    assert batches[0].wav.shape == (4, 800)
    np.testing.assert_array_equal(batches[0].labels, [0, 1, 0, 1])
    # final batch tiled to static shape, tail marked invalid
    assert batches[2].wav.shape == (4, 800)
    np.testing.assert_array_equal(batches[2].valid, [True, True, False, False])


def test_loader_shuffle_deterministic(flac_dataset):
    base, utts, labels = flac_dataset
    index = DatasetIndex.for_train(utts, labels, base)
    loader = BatchLoader(index, batch_size=5, cut=800, shuffle=True, seed=7)
    ids_a = [u for b in loader.epoch(3) for u in b.utt_ids]
    ids_b = [u for b in loader.epoch(3) for u in b.utt_ids]
    ids_c = [u for b in loader.epoch(4) for u in b.utt_ids]
    assert ids_a == ids_b  # same (seed, epoch) -> same order
    assert ids_a != ids_c  # different epoch -> different order
    assert sorted(ids_a) == sorted(utts)


def test_loader_pad_tile_semantics(flac_dataset):
    base, utts, labels = flac_dataset
    index = DatasetIndex.for_train(utts, labels, base)
    loader = BatchLoader(index, batch_size=10, cut=1200)
    (batch,) = list(loader.epoch(0))
    # U_000 is 500 samples of constant 1000 -> tiled to 1200
    np.testing.assert_allclose(
        batch.wav[0], np.full(1200, 1000 / 32768.0, np.float32), atol=1e-6
    )


def test_limit_batches(flac_dataset):
    base, utts, labels = flac_dataset
    index = DatasetIndex.for_train(utts, labels, base)
    loader = BatchLoader(index, batch_size=2, cut=400, limit_batches=2)
    assert loader.num_batches() == 2
    assert len(list(loader.epoch(0))) == 2


def test_array_loader_tail():
    wavs = np.arange(14 * 8, dtype=np.float32).reshape(14, 8)
    labels = np.arange(14) % 2
    loader = ArrayLoader(wavs, labels, batch_size=4)
    batches = list(loader.epoch(0))
    assert len(batches) == 4
    assert batches[-1].wav.shape == (4, 8)
    np.testing.assert_array_equal(batches[-1].valid, [True, True, False, False])


def test_host_shard(flac_dataset):
    base, utts, labels = flac_dataset
    index = DatasetIndex.for_train(utts, labels, base)
    shards = [index.host_shard(i, 4) for i in range(4)]
    # disjoint, complete cover
    all_ids = sorted(u for s in shards for u in s.utt_ids)
    assert all_ids == sorted(utts)
    assert len(shards[0]) == 3 and len(shards[3]) == 2
    # labels follow the shard
    np.testing.assert_array_equal(
        shards[1].labels, [labels[u] for u in shards[1].utt_ids]
    )


class TestInt16Wire:
    """int16 wire format: half the host->device bytes, lossless for
    16-bit sources (pipeline.to_wire / steps.dequantize_wire)."""

    def test_to_wire_roundtrip_lossless_on_i16_grid(self):
        from sls_tpu.data.pipeline import to_wire

        ints = np.array([-32768, -1, 0, 1, 2, 32767], np.int32)
        f = (ints / 32768.0).astype(np.float32)  # what the decoder emits
        wire = to_wire(f, "int16")
        assert wire.dtype == np.int16
        np.testing.assert_array_equal(wire.astype(np.int32), ints)
        back = wire.astype(np.float32) / 32768.0
        np.testing.assert_array_equal(back, f)

    def test_to_wire_clips_and_rejects_unknown(self):
        from sls_tpu.data.pipeline import to_wire

        wire = to_wire(np.array([2.0, -2.0], np.float32), "int16")
        np.testing.assert_array_equal(wire, [32767, -32768])
        np.testing.assert_array_equal(
            to_wire(np.array([0.5], np.float32), "float32"),
            np.array([0.5], np.float32))
        with pytest.raises(ValueError):
            to_wire(np.zeros(1, np.float32), "fp8")

    def test_loader_wire_dtype(self, flac_dataset):
        base, utts, labels = flac_dataset
        index = DatasetIndex.for_train(utts, labels, base)
        lo_f = BatchLoader(index, batch_size=4, cut=800)
        lo_i = BatchLoader(index, batch_size=4, cut=800, wire_dtype="int16")
        bf = next(iter(lo_f.epoch(0)))
        bi = next(iter(lo_i.epoch(0)))
        assert bi.wav.dtype == np.int16
        # FLAC sources are 16-bit: wire roundtrip is bit-exact
        np.testing.assert_array_equal(
            bi.wav.astype(np.float32) / 32768.0, bf.wav)

    def test_dequantize_wire_in_eval_step(self, flac_dataset):
        import jax
        import jax.numpy as jnp

        from sls_tpu.train.steps import dequantize_wire

        base, utts, labels = flac_dataset
        index = DatasetIndex.for_train(utts, labels, base)
        wav_i = next(iter(BatchLoader(
            index, batch_size=4, cut=800, wire_dtype="int16").epoch(0))).wav
        wav_f = next(iter(BatchLoader(
            index, batch_size=4, cut=800).epoch(0))).wav
        out = jax.jit(dequantize_wire)(jnp.asarray(wav_i))
        assert out.dtype == jnp.float32
        np.testing.assert_array_equal(np.asarray(out), wav_f)
        # float input passes through untouched
        same = jax.jit(dequantize_wire)(jnp.asarray(wav_f))
        np.testing.assert_array_equal(np.asarray(same), wav_f)


def test_loader_decode_threads_equivalence(flac_dataset):
    """decode_threads plumbing: explicit thread counts (and the 0=auto
    default, which scales with host cores instead of a hard cap of 4)
    must produce identical batches on the native FLAC path."""
    base, utts, labels = flac_dataset
    index = DatasetIndex.for_train(utts, labels, base)

    def batches(**kw):
        loader = BatchLoader(index, batch_size=4, cut=800, **kw)
        return [(b.utt_ids, b.wav.copy()) for b in loader.epoch(0)]

    ref = batches(decode_threads=1)
    for kw in ({"decode_threads": 3}, {}):  # explicit and auto
        got = batches(**kw)
        assert [ids for ids, _ in got] == [ids for ids, _ in ref]
        for (_, a), (_, b) in zip(got, ref):
            np.testing.assert_array_equal(a, b)
