"""Serving subsystem: batching engine, HTTP front-end, scorer loader.

Beyond-reference coverage (the reference has no online path; its eval
loop is main.py:158-199).  Engine logic tests run against a stub
scorer so they are fast and deterministic; the slow tier drives a real
tiny trained checkpoint end-to-end over HTTP and asserts the served
score equals the offline score-file contract.
"""

import json
import threading
import time
import urllib.request

import numpy as np
import pytest

from sls_tpu.serve.engine import BatchingEngine, _log_probs_to_scores


CUT = 1000


def stub_score_fn(wav):
    """Deterministic per-row scorer: log_probs encode the row mean, so
    tests can verify request->row->response alignment exactly."""
    wav = np.asarray(wav, np.float32)
    p1 = 1.0 / (1.0 + np.exp(-wav.mean(axis=1) * 10.0))
    p1 = np.clip(p1, 1e-6, 1 - 1e-6)
    return np.log(np.stack([1 - p1, p1], axis=1))


def expected_score(row_value: float) -> float:
    wav = np.full((1, CUT), row_value, np.float32)
    return float(_log_probs_to_scores(stub_score_fn(wav))[0])


class TestEngine:
    def test_single_request_partial_batch(self):
        with BatchingEngine(stub_score_fn, 8, cut=CUT, max_wait_ms=1) as eng:
            s = eng.score(np.full(CUT, 0.05, np.float32))
        assert s == pytest.approx(expected_score(0.05), abs=1e-9)
        st = eng.stats()
        assert st.requests == 1 and st.batches == 1
        assert st.mean_fill == pytest.approx(1 / 8)

    def test_full_batch_alignment(self):
        """Every concurrent request gets ITS OWN row's score back."""
        B, n = 8, 24
        values = np.linspace(-0.1, 0.1, n)
        with BatchingEngine(stub_score_fn, B, cut=CUT, max_wait_ms=50) as eng:
            futs = [
                eng.submit(np.full(CUT, v, np.float32)) for v in values
            ]
            got = [f.result(30) for f in futs]
        for v, s in zip(values, got):
            assert s == pytest.approx(expected_score(v), abs=1e-9), v
        st = eng.stats()
        assert st.requests == n
        # 24 requests at batch 8 with a generous wait: at most 4 batches
        # (exact packing depends on thread scheduling)
        assert st.batches <= 4

    def test_short_audio_tiled_long_audio_cropped(self):
        """pad_or_tile at submit: engine accepts arbitrary lengths."""
        with BatchingEngine(stub_score_fn, 4, cut=CUT, max_wait_ms=1) as eng:
            s_short = eng.score(np.full(300, 0.07, np.float32))
            s_long = eng.score(np.full(5 * CUT, 0.07, np.float32))
        # constant audio tiles/crops to the same constant row
        assert s_short == pytest.approx(expected_score(0.07), abs=1e-9)
        assert s_long == pytest.approx(expected_score(0.07), abs=1e-9)

    def test_resample_path(self):
        """A 32k-rate submit is resampled (2x decimation) before tiling."""
        with BatchingEngine(stub_score_fn, 4, cut=CUT, max_wait_ms=1) as eng:
            s = eng.score(np.full(2 * CUT, 0.07, np.float32),
                          sample_rate=32000)
        # FIR edge transients shift the row mean slightly on a constant
        # signal; the stub amplifies mean error 10x through the sigmoid
        assert s == pytest.approx(expected_score(0.07), abs=1e-2)

    def test_scorer_exception_propagates(self):
        def broken(wav):
            raise RuntimeError("device on fire")

        with BatchingEngine(broken, 4, cut=CUT, max_wait_ms=1) as eng:
            fut = eng.submit(np.ones(CUT, np.float32))
            with pytest.raises(RuntimeError, match="device on fire"):
                fut.result(10)

    def test_empty_audio_rejected(self):
        with BatchingEngine(stub_score_fn, 4, cut=CUT) as eng:
            with pytest.raises(ValueError, match="empty audio"):
                eng.submit(np.zeros(0, np.float32))

    def test_stop_fails_queued_requests(self):
        """Requests still queued at shutdown error out, never hang."""
        release = threading.Event()

        def slow(wav):
            release.wait(5)
            return stub_score_fn(wav)

        eng = BatchingEngine(slow, 1, cut=CUT, max_wait_ms=0).start()
        futs = [eng.submit(np.ones(CUT, np.float32)) for _ in range(6)]
        release.set()
        eng.stop()
        results = []
        for f in futs:
            try:
                results.append(f.result(1))
            except RuntimeError as e:
                assert "engine stopped" in str(e)
                results.append(None)
        # every future resolved one way or the other
        assert len(results) == 6

    def test_submit_requires_running_engine(self):
        """submit() on an unstarted or stopped engine raises instead of
        enqueueing a future that can never resolve."""
        eng = BatchingEngine(stub_score_fn, 4, cut=CUT)
        with pytest.raises(RuntimeError, match="not running"):
            eng.submit(np.ones(CUT, np.float32))
        eng.start()
        assert eng.score(np.ones(CUT, np.float32)) > 0
        eng.stop()
        with pytest.raises(RuntimeError, match="not running"):
            eng.submit(np.ones(CUT, np.float32))

    def test_restart_after_stop(self):
        """A stop()ed engine can be start()ed again (the submit error
        message says so): start() clears the stop flag, so the new
        worker serves instead of exiting immediately."""
        eng = BatchingEngine(stub_score_fn, 4, cut=CUT, max_wait_ms=1)
        eng.start()
        assert eng.score(np.full(CUT, 0.05, np.float32)) == pytest.approx(
            expected_score(0.05), abs=1e-9)
        eng.stop()
        eng.start()
        try:
            assert eng.score(np.full(CUT, 0.07, np.float32)) == \
                pytest.approx(expected_score(0.07), abs=1e-9)
        finally:
            eng.stop()

    def test_overload_backpressure_resolves(self):
        """With a tiny queue_depth, submits past the queue block for
        backpressure (never deadlock against the worker's stats lock)
        and every future still resolves."""
        release = threading.Event()

        def slow(wav):
            release.wait(5)
            return stub_score_fn(wav)

        eng = BatchingEngine(slow, 1, cut=CUT, max_wait_ms=0,
                             queue_depth=2).start()
        futs = []

        def feed():
            for _ in range(8):
                futs.append(eng.submit(np.full(CUT, 0.05, np.float32)))

        t = threading.Thread(target=feed)
        t.start()
        time.sleep(0.2)  # let the feeder hit the full queue and block
        release.set()
        t.join(10)
        assert not t.is_alive(), "submit deadlocked on a full queue"
        got = [f.result(10) for f in futs]
        assert len(got) == 8
        assert all(s == pytest.approx(expected_score(0.05), abs=1e-9)
                   for s in got)
        eng.stop()

    def test_throughput_batches_under_load(self):
        """Under a burst, the engine packs near-full batches (the
        reason it exists): mean fill well above single-request."""
        B = 16
        with BatchingEngine(
            stub_score_fn, B, cut=CUT, max_wait_ms=20
        ) as eng:
            futs = []
            for i in range(4 * B):
                futs.append(eng.submit(np.full(CUT, 0.01, np.float32)))
            for f in futs:
                f.result(30)
        st = eng.stats()
        assert st.mean_fill > 0.5
        assert st.p50_ms >= 0.0 and st.p99_ms >= st.p50_ms

    def test_open_loop_paced_arrivals_all_resolve(self):
        """bench_serve's open-loop pattern (submissions paced at a fixed
        rate, futures gathered after the arrival window): every request
        must resolve with ITS row's score even while the batcher keeps
        one batch in flight.  Regression for the paced-arrival path —
        it exercises the have_pending/idle-flush branches of _run in a
        way the burst tests above never do."""
        B, n, rate = 8, 120, 400.0

        def slow(wav):
            time.sleep(0.005)  # emulate device time so batches pipeline
            return stub_score_fn(wav)

        values = np.linspace(-0.1, 0.1, n)
        with BatchingEngine(slow, B, cut=CUT, max_wait_ms=4) as eng:
            futs = []
            t0 = time.monotonic()
            for i, v in enumerate(values):
                delay = (t0 + i / rate) - time.monotonic()
                if delay > 0:
                    time.sleep(delay)
                futs.append(eng.submit(np.full(CUT, v, np.float32)))
            got = [f.result(30) for f in futs]
        for v, s in zip(values, got):
            assert s == pytest.approx(expected_score(v), abs=1e-9), v
        st = eng.stats()
        assert st.requests == n and st.batches >= n // B
        assert st.mean_fill > 0.2  # paced arrivals still pack batches

    def test_score_long_matches_offline_window_contract(self):
        """score_long must aggregate exactly the windows the offline
        full-utterance path extracts (stride cut//2, right-aligned
        tail) — verified against extract_windows + the stub directly."""
        from sls_tpu.evaluation.overlap import extract_windows

        rng = np.random.default_rng(3)
        wav = rng.normal(0, 0.05, size=int(2.7 * CUT)).astype(np.float32)
        windows = extract_windows(wav, CUT)
        from sls_tpu.serve.engine import _log_probs_to_scores as to_s

        expect_each = to_s(stub_score_fn(windows))
        with BatchingEngine(stub_score_fn, 4, cut=CUT, max_wait_ms=5) as eng:
            s_mean, n = eng.score_long(wav)
            s_min, _ = eng.score_long(wav, aggregate="min")
        assert n == len(windows) and n >= 5  # overlap: > ceil(2.7)
        assert s_mean == pytest.approx(float(np.mean(expect_each)), abs=1e-9)
        assert s_min == pytest.approx(float(np.min(expect_each)), abs=1e-9)

    def test_score_long_short_audio_single_window(self):
        with BatchingEngine(stub_score_fn, 4, cut=CUT, max_wait_ms=1) as eng:
            s, n = eng.score_long(np.full(300, 0.07, np.float32))
        assert n == 1
        assert s == pytest.approx(expected_score(0.07), abs=1e-9)

    def test_wire_int16(self):
        """int16 wire: the stub sees quantized rows; scores match the
        float path within the 1/32768 LSB."""
        seen = {}

        def capture(wav):
            seen["dtype"] = np.asarray(wav).dtype
            w = np.asarray(wav, np.float32)
            if seen["dtype"] == np.int16:
                w = w / 32768.0
            return stub_score_fn(w)

        with BatchingEngine(capture, 2, cut=CUT, max_wait_ms=1,
                            wire_dtype="int16") as eng:
            s = eng.score(np.full(CUT, 0.05, np.float32))
        assert seen["dtype"] == np.int16
        assert s == pytest.approx(expected_score(0.05), abs=1e-3)

    def test_bucket_dispatch_uses_smallest_fitting_shape(self):
        """With bucket_sizes, a partial batch dispatches on the
        smallest compiled shape that fits, and scores stay aligned."""
        shapes = []

        def capture(wav):
            shapes.append(np.asarray(wav).shape[0])
            return stub_score_fn(wav)

        with BatchingEngine(capture, 16, cut=CUT, max_wait_ms=40,
                            bucket_sizes=(4, 8)) as eng:
            # 1 request -> shape 4
            s1 = eng.score(np.full(CUT, 0.03, np.float32))
            # 6 concurrent -> shape 8 (one batch: submitted before the
            # worker's max_wait window closes)
            futs = [eng.submit(np.full(CUT, v, np.float32))
                    for v in np.linspace(-0.05, 0.05, 6)]
            got = [f.result(30) for f in futs]
        assert s1 == pytest.approx(expected_score(0.03), abs=1e-9)
        for v, s in zip(np.linspace(-0.05, 0.05, 6), got):
            assert s == pytest.approx(expected_score(v), abs=1e-9)
        assert shapes[0] == 4
        # the 6 requests may split across batches depending on thread
        # timing, but every dispatch uses one of the compiled shapes
        assert all(s in (4, 8, 16) for s in shapes)

    def test_bucket_validation(self):
        with pytest.raises(ValueError, match="bucket_sizes"):
            BatchingEngine(stub_score_fn, 8, cut=CUT, bucket_sizes=(8,))
        with pytest.raises(ValueError, match="bucket_sizes"):
            BatchingEngine(stub_score_fn, 8, cut=CUT, bucket_sizes=(0, 4))

    def test_bad_wire_dtype_rejected_early(self):
        with pytest.raises(ValueError, match="wire_dtype"):
            BatchingEngine(stub_score_fn, 2, cut=CUT, wire_dtype="int4")


def _post(url, data, headers):
    req = urllib.request.Request(url, data=data, headers=headers)
    try:
        with urllib.request.urlopen(req, timeout=30) as resp:
            return resp.status, json.loads(resp.read())
    except urllib.error.HTTPError as e:  # 4xx/5xx carry a JSON body too
        return e.code, json.loads(e.read())


@pytest.fixture()
def http_server():
    from sls_tpu.serve.server import make_server

    eng = BatchingEngine(stub_score_fn, 4, cut=CUT, max_wait_ms=1).start()
    httpd = make_server(eng, "127.0.0.1", 0)  # ephemeral port
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        yield f"http://127.0.0.1:{httpd.server_address[1]}", eng
    finally:
        httpd.shutdown()
        eng.stop()


class TestHTTP:
    def test_healthz_and_stats(self, http_server):
        base, _ = http_server
        with urllib.request.urlopen(base + "/healthz", timeout=10) as r:
            assert json.loads(r.read()) == {"ok": True}
        with urllib.request.urlopen(base + "/stats", timeout=10) as r:
            st = json.loads(r.read())
        assert {"requests", "batches", "p50_ms"} <= set(st)

    def test_score_pcm16(self, http_server):
        base, _ = http_server
        wav = np.full(CUT, 0.05, np.float32)
        pcm = np.clip(np.rint(wav * 32768), -32768, 32767).astype("<i2")
        status, out = _post(
            base + "/score", pcm.tobytes(),
            {"Content-Type": "application/octet-stream"},
        )
        assert status == 200
        assert out["score"] == pytest.approx(expected_score(0.05), abs=1e-3)
        assert out["latency_ms"] >= 0

    def test_score_json_with_resample(self, http_server):
        base, _ = http_server
        body = json.dumps({
            "wav": [0.07] * (2 * CUT), "sample_rate": 32000,
        }).encode()
        status, out = _post(
            base + "/score", body, {"Content-Type": "application/json"},
        )
        assert status == 200
        assert out["score"] == pytest.approx(expected_score(0.07), abs=1e-2)

    def test_score_batch(self, http_server):
        base, _ = http_server
        body = json.dumps({
            "wavs": [[0.05] * CUT, [-0.05] * CUT],
        }).encode()
        status, out = _post(
            base + "/score_batch", body,
            {"Content-Type": "application/json"},
        )
        assert status == 200
        assert out["scores"][0] == pytest.approx(
            expected_score(0.05), abs=1e-9)
        assert out["scores"][1] == pytest.approx(
            expected_score(-0.05), abs=1e-9)

    def test_score_long_endpoint(self, http_server):
        base, _ = http_server
        rng = np.random.default_rng(5)
        wav = rng.normal(0, 0.03, size=int(2.2 * CUT)).astype(np.float32)
        pcm = np.clip(np.rint(wav * 32768), -32768, 32767).astype("<i2")
        status, out = _post(
            base + "/score_long", pcm.tobytes(),
            {"Content-Type": "application/octet-stream",
             "X-Aggregate": "min"},
        )
        assert status == 200
        assert out["n_windows"] >= 4 and out["aggregate"] == "min"
        assert 0.0 <= out["score"] <= 1.0
        # bad aggregate is a 400, not a 500
        status, out = _post(
            base + "/score_long", pcm.tobytes(),
            {"Content-Type": "application/octet-stream",
             "X-Aggregate": "median"},
        )
        assert status == 400 and "aggregate" in out["error"]

    def test_bad_requests(self, http_server):
        base, _ = http_server
        # odd byte count
        status, out = _post(
            base + "/score", b"\x00\x01\x02",
            {"Content-Type": "application/octet-stream"},
        )
        assert status == 400 and "odd byte count" in out["error"]
        # empty body
        status, out = _post(
            base + "/score", b"",
            {"Content-Type": "application/octet-stream"},
        )
        assert status == 400
        # unknown path
        status, out = _post(
            base + "/nope", b"{}", {"Content-Type": "application/json"})
        assert status == 404


@pytest.fixture(scope="module")
def detector_run_dir(tmp_path_factory):
    """One tiny trained detector run dir shared by the slow serve tests."""
    import dataclasses

    from sls_tpu.config import ExperimentConfig, RawBoostConfig, TrainConfig
    from sls_tpu.data.pipeline import ArrayLoader
    from sls_tpu.train.loop import Trainer
    from tests.test_detector_train import (
        WAV_LEN, synthetic_batch, tiny_model_config,
    )

    run_dir = tmp_path_factory.mktemp("serve_run")
    cfg = ExperimentConfig(
        model=tiny_model_config(),
        train=TrainConfig(
            batch_size=8, lr=1e-3, num_epochs=1, cut_length=WAV_LEN,
            rawboost=dataclasses.replace(RawBoostConfig(), algo=0),
        ),
    )
    rng = np.random.default_rng(0)
    wav, y = synthetic_batch(rng, 16)
    loader = ArrayLoader(np.asarray(wav), np.asarray(y), batch_size=8)
    trainer = Trainer(cfg, run_dir, tensorboard=False)
    trainer.init_state(np.zeros((2, WAV_LEN), np.float32))
    trainer.fit(loader, loader)
    return str(run_dir), np.asarray(wav, np.float32)


@pytest.mark.slow
class TestServeRealModel:
    def test_dp_mesh_scorer_matches_single_device(self, detector_run_dir):
        """Multi-chip serving: build_scorer over an 8-device 'data' mesh
        shards every engine batch dp; scores match the single-device
        scorer (reduction-order tolerance only)."""
        import jax.numpy as jnp

        from sls_tpu.parallel.mesh import make_mesh
        from sls_tpu.serve.scorer import build_scorer

        run_dir, wav = detector_run_dir
        mesh = make_mesh()  # 8 virtual CPU devices, ('data',)
        assert mesh.shape["data"] == 8
        _, fwd_dp, cut = build_scorer(
            run_dir, batch_size=8, warmup=False, mesh=mesh)
        _, fwd_1, _ = build_scorer(run_dir, batch_size=8, warmup=False)

        batch = wav[:8]
        logp_dp = np.asarray(fwd_dp(jnp.asarray(batch)))
        logp_1 = np.asarray(fwd_1(jnp.asarray(batch)))
        np.testing.assert_allclose(logp_dp, logp_1, rtol=0, atol=2e-5)

        with pytest.raises(ValueError, match="divisible"):
            build_scorer(run_dir, batch_size=6, warmup=False, mesh=mesh)

    def test_served_score_matches_offline_contract(self, tmp_path):
        """End-to-end: tiny trained run dir -> build_scorer -> engine ->
        HTTP -> score equals the offline eval-step score contract."""
        import dataclasses

        import jax.numpy as jnp

        from sls_tpu.config import ExperimentConfig, RawBoostConfig, TrainConfig
        from sls_tpu.data.pipeline import ArrayLoader
        from sls_tpu.serve.scorer import build_scorer
        from sls_tpu.serve.server import make_server
        from sls_tpu.train.loop import Trainer
        from tests.test_detector_train import (
            WAV_LEN, synthetic_batch, tiny_model_config,
        )

        run_dir = tmp_path / "serve_run"
        cfg = ExperimentConfig(
            model=tiny_model_config(),
            train=TrainConfig(
                batch_size=8, lr=1e-3, num_epochs=1, cut_length=WAV_LEN,
                rawboost=dataclasses.replace(RawBoostConfig(), algo=0),
            ),
        )
        rng = np.random.default_rng(0)
        wav, y = synthetic_batch(rng, 16)
        loader = ArrayLoader(np.asarray(wav), np.asarray(y), batch_size=8)
        trainer = Trainer(cfg, run_dir, tensorboard=False)
        trainer.init_state(np.zeros((2, WAV_LEN), np.float32))
        trainer.fit(loader, loader)

        scfg, forward, cut = build_scorer(
            str(run_dir), batch_size=4, warmup=True)
        assert cut == WAV_LEN

        # offline contract at the SAME batch shape the engine dispatches
        # (XLA numerics are only bit-stable within one compiled shape)
        test_wav = np.asarray(wav[0], np.float32)
        batch4 = np.tile(test_wav[None], (4, 1))
        logp = np.asarray(forward(jnp.asarray(batch4)))
        offline = float(_log_probs_to_scores(logp)[0])

        eng = BatchingEngine(forward, 4, cut=cut, max_wait_ms=1).start()
        httpd = make_server(eng, "127.0.0.1", 0)
        t = threading.Thread(target=httpd.serve_forever, daemon=True)
        t.start()
        try:
            base = f"http://127.0.0.1:{httpd.server_address[1]}"
            pcm = np.clip(
                np.rint(test_wav * 32768), -32768, 32767).astype("<i2")
            status, out = _post(
                base + "/score", pcm.tobytes(),
                {"Content-Type": "application/octet-stream"},
            )
        finally:
            httpd.shutdown()
            eng.stop()
        assert status == 200
        # int16 PCM on the wire: one LSB of quantization vs the float
        # forward; the engine itself adds zero numeric difference
        assert out["score"] == pytest.approx(offline, abs=1e-3)

        # exact check: the float wire through the engine is bit-equal to
        # the offline contract at the same batch shape — the engine adds
        # zero numeric difference
        with BatchingEngine(forward, 4, cut=cut, max_wait_ms=1) as eng2:
            direct = eng2.score(test_wav)
        assert direct == pytest.approx(offline, rel=0, abs=0)

    def test_build_scorer_sls_family(self, tmp_path):
        """The scorer loader's SLS branch: family auto-detected from the
        param tree ('sls_head'), batch_stats threaded through, scores in
        [0, 1]."""
        import dataclasses

        from sls_tpu.config import ExperimentConfig, RawBoostConfig, TrainConfig
        from sls_tpu.data.pipeline import ArrayLoader
        from sls_tpu.models.sls import SLSTrainer
        from sls_tpu.serve.scorer import build_scorer
        from tests.test_detector_train import (
            WAV_LEN, synthetic_batch, tiny_model_config,
        )

        run_dir = tmp_path / "sls_run"
        cfg = ExperimentConfig(
            model=tiny_model_config(use_sae=False),
            train=TrainConfig(
                batch_size=8, lr=1e-3, num_epochs=1, cut_length=WAV_LEN,
                rawboost=dataclasses.replace(RawBoostConfig(), algo=0),
            ),
        )
        rng = np.random.default_rng(1)
        wav, y = synthetic_batch(rng, 16)
        loader = ArrayLoader(np.asarray(wav), np.asarray(y), batch_size=8)
        trainer = SLSTrainer(cfg, run_dir, tensorboard=False)
        trainer.init_state(np.zeros((2, WAV_LEN), np.float32))
        trainer.fit(loader, loader)

        scfg, forward, cut = build_scorer(
            str(run_dir), batch_size=2, warmup=True)
        assert not scfg.model.use_sae  # SLS family detected
        with BatchingEngine(forward, 2, cut=cut, max_wait_ms=1) as eng:
            s = eng.score(np.asarray(wav[0], np.float32))
        assert 0.0 <= s <= 1.0
