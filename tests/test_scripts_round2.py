"""Functional tests for the round-2 dataset adapters (the 15 reference
scripts ported this round), driven at the CLI surface on synthetic trees."""
import json
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

ROOT = Path(__file__).resolve().parents[1]
ENV = {"JAX_PLATFORMS": "cpu", "PATH": "/usr/bin:/bin",
       "PYTHONPATH": str(ROOT) + ":/root/.axon_site", "HOME": "/root"}


def run(script, *argv):
    res = subprocess.run(
        [sys.executable, str(ROOT / "scripts" / script), *map(str, argv)],
        capture_output=True, text=True, timeout=180, env=ENV,
    )
    assert res.returncode == 0, res.stderr[-1200:]
    return res.stdout


def _write_wav(path, seconds=2.0, sr=16000, f=330.0):
    from scipy.io import wavfile

    t = np.arange(int(seconds * sr)) / sr
    wav = (0.4 * np.sin(2 * np.pi * f * t)).astype(np.float32)
    path.parent.mkdir(parents=True, exist_ok=True)
    wavfile.write(str(path), sr, (wav * 32767).astype(np.int16))


# ---------------------------------------------------------------------------
# metadata.json writers
# ---------------------------------------------------------------------------


def test_voxceleb1_metadata(tmp_path):
    meta = tmp_path / "vox1_meta.csv"
    meta.write_text(
        "VoxCeleb1 ID\tVGGFace1 ID\tGender\tNationality\tSet\n"
        "id10001\tA.J._Buckley\tm\tIreland\tdev\n"
        "id10002\tJane_Doe\tf\tUSA\ttest\n"
    )
    enc = tmp_path / "enc"
    (enc / "voxceleb_VoxCeleb1_id10001").mkdir(parents=True)
    (enc / "voxceleb_VoxCeleb1_id10099").mkdir(parents=True)  # not in meta
    run("voxceleb1_metadata.py", meta, enc)
    m1 = json.loads(
        (enc / "voxceleb_VoxCeleb1_id10001" / "metadata.json").read_text()
    )
    assert m1["gender"] == "male" and m1["nationality"] == "Ireland"
    assert m1["name"] == "A.J._Buckley" and m1["language"] == "en"
    m2 = json.loads(
        (enc / "voxceleb_VoxCeleb1_id10099" / "metadata.json").read_text()
    )
    assert m2["gender"] == "unknown"


def test_voxceleb2_metadata(tmp_path):
    meta = tmp_path / "vox2_meta.csv"
    meta.write_text(
        "VoxCeleb2 ID ,VGGFace2 ID ,Gender ,Set\n"
        "id00012 ,n000012 ,f ,dev\n"
    )
    enc = tmp_path / "enc"
    (enc / "voxceleb_VoxCeleb2_id00012").mkdir(parents=True)
    run("voxceleb2_metadata.py", meta, enc)
    m = json.loads(
        (enc / "voxceleb_VoxCeleb2_id00012" / "metadata.json").read_text()
    )
    assert m["gender"] == "female"


def test_slr_metadata(tmp_path):
    enc = tmp_path / "enc"
    (enc / "slr41_jv_female_03424").mkdir(parents=True)
    (enc / "slr70_en_male_0001").mkdir(parents=True)
    (enc / "slr99_unknown_corpus").mkdir(parents=True)  # unmapped id
    run("slr_metadata.py", enc)
    m = json.loads((enc / "slr41_jv_female_03424" / "metadata.json").read_text())
    assert m["language"] == "jv" and m["gender"] == "female"
    m = json.loads((enc / "slr70_en_male_0001" / "metadata.json").read_text())
    assert m["language"] == "en-NG" and m["gender"] == "male"
    assert not (enc / "slr99_unknown_corpus" / "metadata.json").exists()


def test_slr68_metadata(tmp_path):
    spkinfo = tmp_path / "SPKINFO.txt"
    spkinfo.write_text(
        "SPKID\tAge\tGender\tDialect\n14_3466\t18\tfemale\the bei\n"
    )
    enc = tmp_path / "enc"
    (enc / "slr68_train_14_3466").mkdir(parents=True)
    run("slr68_metadata.py", spkinfo, enc)
    m = json.loads((enc / "slr68_train_14_3466" / "metadata.json").read_text())
    assert m["gender"] == "female" and m["age"] == "teens"
    assert m["language"] == "zh" and m["nationality"] == "he bei"


def test_vctk_metadata(tmp_path):
    info = tmp_path / "speaker-info.txt"
    info.write_text(
        "ID  AGE  GENDER  ACCENTS  REGION COMMENTS\n"
        "225  23  F    English    Southern  England\n"
        "226  22  M    English    Surrey\n"
    )
    enc = tmp_path / "enc"
    (enc / "VCTK-Corpus_wav48_p225").mkdir(parents=True)
    (enc / "VCTK-Corpus_wav48_p226").mkdir(parents=True)
    run("vctk_metadata.py", info, enc)
    m = json.loads((enc / "VCTK-Corpus_wav48_p225" / "metadata.json").read_text())
    assert m["gender"] == "female" and m["age"] == "twenties"
    assert m["accent"] == "English"
    assert m["region"] == "Southern  England"  # multi-word region survives
    m = json.loads((enc / "VCTK-Corpus_wav48_p226" / "metadata.json").read_text())
    assert m["gender"] == "male" and m["age_year"] == 22


def test_cv_metadata(tmp_path):
    lang = tmp_path / "cv" / "it"
    lang.mkdir(parents=True)
    cid = "a" * 64
    (lang / "validated.tsv").write_text(
        "client_id\tpath\tsentence\tup_votes\tdown_votes\tage\tgender\taccent\n"
        f"{cid}\tclip_1.mp3\tIl vuoto assoluto?\t2\t1\ttwenties\tmale\t\n"
        f"{cid}\tclip_2.mp3\tAltro testo.\t3\t0\ttwenties\tmale\t\n"
    )
    enc = tmp_path / "enc"
    spk = enc / f"CommonVoice_it_speakers_{cid[:20]}"
    spk.mkdir(parents=True)
    np.save(spk / "clip_1.npy", np.zeros(3))
    run("cv_metadata.py", lang, enc, "--lang", "it")
    m = json.loads((spk / "metadata.json").read_text())
    assert m["gender"] == "male" and m["age"] == "twenties"
    assert list(m["utterances"]) == ["clip_1"]  # clip_2 has no .npy
    assert m["utterances"]["clip_1"]["up_votes"] == 2


# ---------------------------------------------------------------------------
# transcript / segmentation adapters
# ---------------------------------------------------------------------------


def test_cv_speaker_transcript(tmp_path):
    lang = tmp_path / "it"
    lang.mkdir()
    cid = "b" * 64
    (lang / "validated.tsv").write_text(
        "client_id\tpath\tsentence\tup_votes\tdown_votes\tage\tgender\taccent\n"
        f"{cid}\tclip_9.mp3\tCiao mondo\t1\t0\t\t\t\n"
    )
    _write_wav(lang / "speakers" / cid[:20] / "clip_9.wav")
    run("cv_speaker_transcript.py", lang)
    txt = lang / "speakers" / cid[:20] / "clip_9.txt"
    assert txt.read_text() == "Ciao mondo"


def test_stm_parser():
    sys.path.insert(0, str(ROOT / "scripts"))
    try:
        from stm import parse_stm_file
    finally:
        sys.path.pop(0)
    import tempfile

    with tempfile.NamedTemporaryFile("w", suffix=".stm", delete=False) as f:
        f.write(
            "talk1 1 talk1_spk 0.5 2.5 <o,f0,male> hello wörld again\n"
            "talk1 1 talk1_spk 3.0 4.0 <o> ignore_time_segment_in_scoring\n"
        )
        path = f.name
    segs = parse_stm_file(path)
    assert len(segs) == 1
    seg = segs[0]
    assert seg.speaker_id == "talk1_spk"
    assert seg.start_time == 0.5 and seg.stop_time == 2.5
    assert seg.transcript == "hello world again"  # NFKD→ascii like the ref


def test_tedlium_transcript(tmp_path):
    sr = 16000
    root = tmp_path / "TEDLIUM"
    (root / "sph").mkdir(parents=True)
    (root / "stm").mkdir()
    # NIST SPHERE file with 3 s of tone
    t = np.arange(3 * sr) / sr
    wav = (0.4 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    pcm = (wav * 32767).astype("<i2").tobytes()
    header = (
        "NIST_1A\n   1024\n"
        "sample_rate -i 16000\nchannel_count -i 1\nsample_n_bytes -i 2\n"
        f"sample_count -i {len(wav)}\n"
        "sample_byte_format -s2 01\nsample_coding -s3 pcm\nend_head\n"
    ).encode()
    (root / "sph" / "AlGore_2009.sph").write_bytes(
        header + b" " * (1024 - len(header)) + pcm
    )
    (root / "stm" / "AlGore_2009.stm").write_text(
        "AlGore_2009 1 AlGore 0.2 1.2 <o,f0,male> thank you so much chris\n"
        "AlGore_2009 1 AlGore 1.5 2.8 <o,f0,male> and it is <unk> truly a "
        "great honor\n"
    )
    out = tmp_path / "speakers"
    run("tedlium_transcript.py", root, "-o", out)
    spk = out / "AlGore"
    wavs = sorted(p.name for p in spk.glob("*.wav"))
    assert wavs == ["AlGore_2009_0000.wav", "AlGore_2009_0001.wav"]
    # the double space where <unk> was removed matches the reference's
    # replace-then-strip behavior (ref tedlium_transcript.py:59-62)
    assert (spk / "AlGore_2009_0001.txt").read_text() == \
        "and it is  truly a great honor"
    from scipy.io import wavfile

    got_sr, seg = wavfile.read(str(spk / "AlGore_2009_0000.wav"))
    assert got_sr == sr and abs(len(seg) - sr) < 10  # 1.2-0.2 = 1 s


def test_tedx_speakers(tmp_path):
    root = tmp_path / "mtedx"
    (root / "wav").mkdir(parents=True)
    (root / "vtt").mkdir()
    _write_wav(root / "wav" / "talk01.wav", seconds=10.0)
    (root / "vtt" / "talk01.es.vtt").write_text(
        "WEBVTT\n\n"
        "00:00:01.000 --> 00:00:02.500\nHola mundo\n\n"
        "00:00:03.000 --> 00:00:04.000\nSegunda frase\n\n"
        "00:00:05.000 --> 00:00:06.000\nTercera\n\n"
        "00:00:07.000 --> 00:00:08.000\nCuarta\n\n"
        "00:00:08.200 --> 00:00:09.100\nQuinta\n"
    )
    out = tmp_path / "speakers"
    run("tedx_speakers.py", root, "-o", out, "--min", "5", "--max", "40")
    utts = sorted((out / "talk01").glob("*.wav"))
    assert len(utts) == 5
    assert (out / "talk01" / "talk01_0000.txt").read_text() == "Hola mundo"
    from scipy.io import wavfile

    sr, seg = wavfile.read(str(utts[0]))
    assert abs(len(seg) - int(1.5 * sr)) < 10

    # below --min: skipped entirely
    _write_wav(root / "wav" / "talk02.wav", seconds=4.0)
    (root / "vtt" / "talk02.es.vtt").write_text(
        "WEBVTT\n\n00:00:01.000 --> 00:00:02.000\nSolo una\n"
    )
    run("tedx_speakers.py", root, "-o", out, "--min", "5", "--max", "40")
    assert not (out / "talk02").exists()


def test_commonvoice_transcript(tmp_path):
    pytest.importorskip("scipy")
    from rtvc_tpu.utils.libav import libav_supported

    if not libav_supported():
        pytest.skip("codec shim not built")
    lang = tmp_path / "cv" / "it"
    (lang / "clips").mkdir(parents=True)
    cid = "c" * 64
    # real mp3 clip via the codec shim
    from rtvc_tpu.utils.libav import encode_audio

    sr = 16000
    t = np.arange(sr) / sr
    encode_audio(lang / "clips" / "clip_7.mp3",
                 (0.4 * np.sin(2 * np.pi * 440 * t)).astype(np.float32), sr)
    (lang / "validated.tsv").write_text(
        "client_id\tpath\tsentence\tup_votes\tdown_votes\tage\tgender\taccent\n"
        f"{cid}\tclip_7.mp3\tBuona sera\t1\t0\t\t\t\n"
    )
    run("commonvoice_transcript.py", tmp_path / "cv", "--lang", "it")
    spk = lang / "speakers" / cid
    assert (spk / "clip_7.txt").read_text() == "Buona sera"
    from rtvc_tpu.utils.io import load_wav

    wav, got_sr = load_wav(spk / "clip_7.flac")
    assert got_sr == sr and abs(len(wav) - sr) < sr // 10


# ---------------------------------------------------------------------------
# TextGrid stats tools
# ---------------------------------------------------------------------------

_TEXTGRID = """File type = "ooTextFile"
Object class = "TextGrid"
xmin = 0
xmax = 2
tiers? <exists>
size = 2
item []:
    item [1]:
        class = "IntervalTier"
        name = "words"
        xmin = 0
        xmax = 2
        intervals: size = 2
        intervals [1]:
            xmin = 0.0
            xmax = 0.5
            text = "hello"
        intervals [2]:
            xmin = 0.5
            xmax = 2.0
            text = "world"
    item [2]:
        class = "IntervalTier"
        name = "phones"
        xmin = 0
        xmax = 2
        intervals: size = 2
        intervals [1]:
            xmin = 0.0
            xmax = 0.3
            text = "HH"
        intervals [2]:
            xmin = 0.3
            xmax = 0.5
            text = "AH0"
"""


def _make_aligned_tree(root: Path, n_grids=2):
    for i in range(n_grids):
        d = root / f"spk{i}" / "book"
        d.mkdir(parents=True)
        (d / f"utt{i}.TextGrid").write_text(_TEXTGRID)


def test_textgrid_stats_and_csv(tmp_path):
    root = tmp_path / "aligned"
    _make_aligned_tree(root)
    run("textgrid_stats.py", root)
    stats = json.loads((root / "stats.json").read_text())
    assert stats["words"]["hello"]["count"] == 2
    assert abs(stats["words"]["hello"]["duration"]["avg"] - 0.5) < 1e-9
    assert stats["phones"]["HH"]["count"] == 2
    assert abs(stats["phones"]["AH0"]["duration"]["min"] - 0.2) < 1e-9

    run("textgrid_stats2csv.py", root / "stats.json", "--type", "phones")
    csv_text = (root / "stats_phones.csv").read_text()
    assert "HH" in csv_text and "duration_avg" in csv_text


def test_textgrid_stats_combined(tmp_path):
    root = tmp_path / "aligned"
    _make_aligned_tree(root / "ds1")
    _make_aligned_tree(root / "ds2", n_grids=1)
    run("textgrid_stats_combined.py", root, "ds1", "ds2")
    stats = json.loads((root / "stats_combined.json").read_text())
    assert stats["words"]["hello"]["count"] == 3  # 2 + 1


# ---------------------------------------------------------------------------
# Embedding projection demo + shell helper
# ---------------------------------------------------------------------------


@pytest.mark.slow  # embeds with the production-dims encoder (~25 s)
def test_ted_project(tmp_path):
    root = tmp_path / "speakers"
    for spk, f in (("s1", 300.0), ("s2", 800.0)):
        for u in range(2):
            _write_wav(root / spk / f"u{u}.wav", seconds=2.0, f=f)
    run("ted_project.py", root)
    assert (root / "projections.png").stat().st_size > 1000


def test_convert_revert_sh(tmp_path):
    (tmp_path / "a.m4a").write_bytes(b"x")
    (tmp_path / "a.flac").write_bytes(b"y")  # converted twin → deleted
    (tmp_path / "b.mp3").write_bytes(b"x")   # no twin → kept
    res = subprocess.run(
        ["bash", str(ROOT / "scripts" / "convert_revert.sh")],
        cwd=tmp_path, capture_output=True, text=True, timeout=60,
    )
    assert res.returncode == 0, res.stderr
    assert not (tmp_path / "a.flac").exists()
    assert (tmp_path / "a.m4a").exists() and (tmp_path / "b.mp3").exists()
