"""CLI smoke tests: parsers construct and --help exits cleanly; the tools
subcommands that have no heavy deps run end-to-end on tiny inputs."""
import os
import pickle

import numpy as np
import pytest


@pytest.mark.parametrize("mod", [
    "tal_asrd_tpu.cli.train",
    "tal_asrd_tpu.cli.test",
    "tal_asrd_tpu.cli.transcribe",
    "tal_asrd_tpu.cli.gen_embed",
    "tal_asrd_tpu.cli.train_embed",
    "tal_asrd_tpu.cli.train_lm",
    "tal_asrd_tpu.cli.wder",
    "tal_asrd_tpu.cli.wder_search",
    "tal_asrd_tpu.cli.vad",
    "tal_asrd_tpu.cli.uisrnn",
    "tal_asrd_tpu.cli.tools",
])
def test_cli_help(mod):
    import importlib

    m = importlib.import_module(mod)
    with pytest.raises(SystemExit) as exc:
        m.main(["--help"])
    assert exc.value.code == 0


def test_tools_train_tokenizer(tmp_path):
    from tal_asrd_tpu.cli import tools

    corpus = tmp_path / "corpus.txt"
    corpus.write_text("the quick brown fox\nthe lazy dog\n" * 50)
    tools.main([
        "train-tokenizer", "--input", str(corpus),
        "--model-prefix", str(tmp_path / "tok"), "--vocab-size", "100",
    ])
    assert os.path.exists(tmp_path / "tok.model")


def test_tools_average_ckpt(tmp_path):
    from tal_asrd_tpu.cli import tools
    from tal_asrd_tpu.core.checkpoint import CheckpointManager, load_pytree

    mgr = CheckpointManager(str(tmp_path / "ckpts"))
    for s in (1, 2, 3):
        mgr.save(s, {"w": np.full((2,), float(s))})
    out = str(tmp_path / "avg.msgpack")
    tools.main(["average-ckpt", "--ckpt-dir", str(tmp_path / "ckpts"),
                "--last-k", "2", "--out", out])
    np.testing.assert_allclose(load_pytree(out)["w"], 2.5)


def test_cli_wder_end_to_end(tmp_path, capsys):
    from tal_asrd_tpu.cli import wder

    pairs = [(
        [("hello world", 0), ("goodbye", 1)],
        [("hello world", 0), ("goodbye", 1)],
    )]
    path = tmp_path / "pairs.pkl"
    with open(path, "wb") as f:
        pickle.dump(pairs, f)
    wder.main(["--eval-file", str(path), "--workers", "1",
               "--metric", "euclidean"])
    assert os.path.exists(tmp_path / "pairs-wder.pkl")
