"""Deployment artifacts (serve/export.py, cli/export.py).

The exported StableHLO program must reproduce the live (jit-from-
source) scorer's log-probs, reject shape/dtype drift loudly (it cannot
retrace), and plug into the batching engine via its manifest.  Beyond-
reference coverage: the reference deploys by copying .pth files plus
matching model source (reference main.py:753-764).
"""

import dataclasses
import json
from pathlib import Path

import numpy as np
import pytest

from sls_tpu.config import ExperimentConfig, RawBoostConfig, TrainConfig
from sls_tpu.data.pipeline import ArrayLoader, to_wire
from sls_tpu.serve.engine import BatchingEngine
from sls_tpu.serve.export import (
    MANIFEST_NAME, PARAMS_NAME, PROGRAM_NAME,
    build_scorer_from_export, export_serving, load_exported,
)
from sls_tpu.serve.scorer import load_serving_model
from tests.test_detector_train import (
    WAV_LEN, synthetic_batch, tiny_model_config,
)


def _train_tiny_run(run_dir, *, sls: bool = False, seed: int = 0):
    cfg = ExperimentConfig(
        model=tiny_model_config(**({"use_sae": False} if sls else {})),
        train=TrainConfig(
            batch_size=8, lr=1e-3, num_epochs=1, cut_length=WAV_LEN,
            rawboost=dataclasses.replace(RawBoostConfig(), algo=0),
        ),
    )
    rng = np.random.default_rng(seed)
    wav, y = synthetic_batch(rng, 16)
    loader = ArrayLoader(np.asarray(wav), np.asarray(y), batch_size=8)
    if sls:
        from sls_tpu.models.sls import SLSTrainer as Trainer
    else:
        from sls_tpu.train.loop import Trainer
    trainer = Trainer(cfg, run_dir, tensorboard=False)
    trainer.init_state(np.zeros((2, WAV_LEN), np.float32))
    trainer.fit(loader, loader)
    return np.asarray(wav, np.float32)


@pytest.fixture(scope="module")
def detector_export(tmp_path_factory):
    """One tiny trained detector run + one float32 artifact, shared."""
    root = tmp_path_factory.mktemp("export")
    run_dir = root / "run"
    wav = _train_tiny_run(run_dir)
    art = root / "artifact"
    manifest = export_serving(
        str(run_dir), str(art), batch_size=4, wire_dtype="float32")
    return str(run_dir), str(art), manifest, wav


class TestExportRoundTrip:
    def test_artifact_layout_and_manifest(self, detector_export):
        _, art, manifest, _ = detector_export
        for name in (MANIFEST_NAME, PROGRAM_NAME, PARAMS_NAME):
            assert (Path(art) / name).exists(), name
        assert manifest["family"] == "detector"
        assert manifest["n_args"] == 1
        assert manifest["batch_size"] == 4
        assert manifest["cut"] == WAV_LEN
        assert manifest["wire_dtype"] == "float32"
        # config rides along for provenance
        assert manifest["config"]["model"]["sae"]["variant"] == "per_timestep"
        on_disk = json.loads((Path(art) / MANIFEST_NAME).read_text())
        assert on_disk["platforms"] == manifest["platforms"]

    def test_reload_matches_live_scorer(self, detector_export):
        run_dir, art, manifest, wav = detector_export
        _, exported_fwd = load_exported(art)
        _, live_fwd = load_serving_model(run_dir)
        batch = wav[:4]
        got = np.asarray(exported_fwd(batch), np.float64)
        want = np.asarray(live_fwd(batch), np.float64)
        np.testing.assert_allclose(got, want, rtol=0, atol=2e-5)

    def test_shape_and_dtype_drift_rejected(self, detector_export):
        _, art, _, wav = detector_export
        _, forward = load_exported(art)
        with pytest.raises(ValueError, match="fixed at wav"):
            forward(wav[:3])  # wrong batch
        with pytest.raises(ValueError, match="fixed at wav"):
            forward(wav[:4].astype(np.int16))  # wrong wire dtype
        with pytest.raises(ValueError, match="fixed at wav"):
            forward(wav[:4, :-1])  # wrong cut

    def test_format_version_gate(self, detector_export, tmp_path):
        import shutil

        _, art, _, _ = detector_export
        bad = tmp_path / "bad"
        shutil.copytree(art, bad)
        m = json.loads((bad / MANIFEST_NAME).read_text())
        m["format_version"] = 999
        (bad / MANIFEST_NAME).write_text(json.dumps(m))
        with pytest.raises(ValueError, match="format_version"):
            load_exported(str(bad))

    def test_unknown_wire_rejected_at_export(self, detector_export):
        run_dir, _, _, _ = detector_export
        with pytest.raises(ValueError, match="wire_dtype"):
            export_serving(run_dir, "/tmp/nope", wire_dtype="int4")


class TestExportServing:
    def test_int16_wire_through_engine(self, detector_export, tmp_path):
        """int16 artifact + engine: served score equals the live float
        scorer within the int16 wire's half-LSB."""
        run_dir, _, _, wav = detector_export
        art = tmp_path / "art_i16"
        export_serving(str(run_dir), str(art),
                       batch_size=4, wire_dtype="int16")
        manifest, forward, cut = build_scorer_from_export(str(art))
        assert manifest["wire_dtype"] == "int16"
        assert cut == WAV_LEN

        _, live_fwd = load_serving_model(run_dir)
        batch = np.tile(wav[0][None], (4, 1))
        live_logp = np.asarray(live_fwd(to_wire(batch, "int16")))
        live_score = float(np.exp(np.asarray(live_logp, np.float64))[0, 1])

        with BatchingEngine(forward, manifest["batch_size"], cut=cut,
                            max_wait_ms=1, wire_dtype="int16") as eng:
            served = eng.score(wav[0])
        assert served == pytest.approx(live_score, abs=1e-6)

    def test_sls_family_export(self, tmp_path):
        """SLS family: batch_stats rides as the second exported arg."""
        run_dir = tmp_path / "sls_run"
        wav = _train_tiny_run(run_dir, sls=True, seed=1)
        art = tmp_path / "sls_art"
        manifest = export_serving(str(run_dir), str(art), batch_size=2)
        assert manifest["family"] == "sls"
        assert manifest["n_args"] == 2
        _, exported_fwd = load_exported(str(art))
        _, live_fwd = load_serving_model(str(run_dir))
        batch = wav[:2]
        np.testing.assert_allclose(
            np.asarray(exported_fwd(batch), np.float64),
            np.asarray(live_fwd(batch), np.float64),
            rtol=0, atol=2e-5)


class TestExportCLI:
    def test_cli_export_verify(self, detector_export, tmp_path, capsys):
        from sls_tpu.cli.export import main

        run_dir, _, _, _ = detector_export
        out = tmp_path / "cli_art"
        rc = main([run_dir, "--out", str(out),
                   "--batch", "4", "--wire", "int16", "--verify"])
        assert rc == 0
        # last line is the single-line verify record
        last = capsys.readouterr().out.strip().splitlines()[-1]
        assert json.loads(last)["verify_max_abs_diff"] < 1e-3
