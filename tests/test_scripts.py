"""Functional tests for the dataset-adapter scripts (driven at the CLI
surface, like a user would run them)."""
import json
import subprocess
import sys
from pathlib import Path

import numpy as np

ROOT = Path(__file__).resolve().parents[1]
ENV = {"JAX_PLATFORMS": "cpu", "PATH": "/usr/bin:/bin",
       "PYTHONPATH": str(ROOT) + ":/root/.axon_site", "HOME": "/root"}


def run(script, *argv):
    res = subprocess.run(
        [sys.executable, str(ROOT / "scripts" / script), *map(str, argv)],
        capture_output=True, text=True, timeout=120, env=ENV,
    )
    assert res.returncode == 0, res.stderr[-800:]
    return res.stdout


def test_slr_speakers_grouping(tmp_path):
    src = tmp_path / "slr"
    src.mkdir()
    for spk in ("a_1", "a_2"):
        for u in range(3):
            (src / f"{spk}_{u:03d}.wav").write_bytes(b"RIFF")
    (src / "a_3_000.wav").write_bytes(b"RIFF")  # 1 file < --min
    out = tmp_path / "out"
    run("slr_speakers.py", src, "-o", out, "--min", 2, "--max", 2, "-t", 1)
    speakers = sorted(p.name for p in (out / "speakers").iterdir())
    assert speakers == ["a_1", "a_2"]
    for s in speakers:  # capped at --max
        assert len(list((out / "speakers" / s).iterdir())) == 2


def test_nasjonalbank_lang_scoping(tmp_path):
    for lang, sess, spk in (("no", "s1", "p1"), ("sv", "s1", "p9")):
        d = tmp_path / lang / sess / spk
        d.mkdir(parents=True)
        for u in range(2):
            (d / f"u{u}.wav").write_bytes(b"RIFF")
    out = tmp_path / "out"
    run("nasjonalbank_speakers.py", tmp_path, "-o", out, "--lang", "no",
        "--min", 1, "-t", 1)
    speakers = [p.name for p in (out / "speakers").iterdir()]
    assert speakers == ["s1_p1"]  # sv subtree excluded


def test_slr82_per_dir_speakers(tmp_path):
    src = tmp_path / "cnceleb"
    for spk in ("id0", "id1"):
        d = src / spk / "nested"
        d.mkdir(parents=True)
        for u in range(2):
            (d / f"{u}.flac").write_bytes(b"fLaC")
    out = tmp_path / "out"
    run("slr82_speakers.py", src, "-o", out, "--min", 1, "-t", 1)
    assert sorted(p.name for p in (out / "speakers").iterdir()) == ["id0", "id1"]


def test_clean_encoder_dataset(tmp_path):
    for name, n in (("rich", 6), ("poor", 2)):
        d = tmp_path / name
        d.mkdir()
        np.savez(d / "combined.npz",
                 **{f"u{i}": np.zeros(3, np.float32) for i in range(n)})
    out = run("clean_encoder_dataset.py", tmp_path, "--min", 5)
    assert "Kept 1 speakers, removed 1." in out
    assert (tmp_path / "rich").exists() and not (tmp_path / "poor").exists()


def test_merge_synthesizer_datasets(tmp_path):
    for i in (0, 1):
        src = tmp_path / f"src{i}"
        (src / "mels").mkdir(parents=True)
        (src / "wav").mkdir()
        uid = f"utt{i}"
        np.save(src / "mels" / f"mel-{uid}.npy", np.zeros((4, 80), np.float32))
        np.save(src / "wav" / f"audio-{uid}.npy", np.zeros(100, np.float32))
        (src / "train.json").write_text(json.dumps(
            {"spk": [f"{uid}|100|4|text {i}"]}
        ))
    out = tmp_path / "merged"
    run("merge_synthesizer_datasets.py", tmp_path / "src0", tmp_path / "src1",
        "-o", out)
    meta = json.loads((out / "train.json").read_text())
    assert len(meta["spk"]) == 2
    assert len(list((out / "mels").iterdir())) == 2
    assert len(list((out / "wav").iterdir())) == 2


def test_merge_rejects_utterance_collision(tmp_path):
    for i in (0, 1):
        src = tmp_path / f"src{i}"
        src.mkdir()
        (src / "train.json").write_text(json.dumps({"spk": ["dup|1|1|x"]}))
    res = subprocess.run(
        [sys.executable, str(ROOT / "scripts" / "merge_synthesizer_datasets.py"),
         str(tmp_path / "src0"), str(tmp_path / "src1"),
         "-o", str(tmp_path / "m")],
        capture_output=True, text=True, timeout=120, env=ENV,
    )
    assert res.returncode != 0
    assert "collision" in res.stderr
