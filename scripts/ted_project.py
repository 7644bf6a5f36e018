"""Project utterance embeddings of a speakers tree into 2-D and save a
scatter plot, one color per speaker (ref demo: scripts/ted_project.py, which
uses resemblyzer + UMAP; here the framework's own speaker encoder embeds and
the projection comes from rtvc_tpu.utils.projection).

Usage: python scripts/ted_project.py <speakers_root> [-m encoder.pt]
where <speakers_root>/<speaker>/*.{wav,flac,mp3} holds the utterances.
"""
import argparse
from pathlib import Path

import numpy as np

if __name__ == "__main__":
    parser = argparse.ArgumentParser(
        description="2-D projection of utterance embeddings per speaker.",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
    )
    parser.add_argument("speakers_root", type=Path,
                        help="Dir with one subdir of audio files per speaker")
    parser.add_argument("-m", "--model", type=Path, default=None,
                        help="Encoder checkpoint (random-init if omitted)")
    parser.add_argument("-o", "--out", type=Path, default=None,
                        help="Output PNG (default <root>/projections.png)")
    parser.add_argument("--max_utterances", type=int, default=10,
                        help="Per-speaker cap")
    args = parser.parse_args()

    from rtvc_tpu.inference import encoder

    if args.model is not None:
        encoder.load_model(args.model)
    else:
        print("No checkpoint given — using a random-init encoder "
              "(clusters reflect spectral similarity only).")
        encoder.init_random_model()

    embeds, speakers = [], []
    exts = (".wav", ".flac", ".mp3", ".m4a", ".ogg")
    for spk_dir in sorted(d for d in args.speakers_root.iterdir() if d.is_dir()):
        files = sorted(
            f for f in spk_dir.iterdir() if f.suffix.lower() in exts
        )[: args.max_utterances]
        for f in files:
            wav = encoder.preprocess_wav(f)
            if len(wav) < 1600:
                continue
            embeds.append(encoder.embed_utterance(wav))
            speakers.append(spk_dir.name)
    if not embeds:
        raise SystemExit("No utterances found.")
    embeds = np.stack(embeds)
    print(f"Embedded {len(embeds)} utterances from "
          f"{len(set(speakers))} speakers.")

    from rtvc_tpu.utils.projection import project_2d

    pts = project_2d(embeds)

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(6, 6))
    names = sorted(set(speakers))
    cmap = plt.get_cmap("tab20")
    for i, name in enumerate(names):
        sel = [j for j, s in enumerate(speakers) if s == name]
        ax.scatter(pts[sel, 0], pts[sel, 1], s=14, color=cmap(i % 20),
                   label=name)
    ax.set_title("Embedding projections")
    if len(names) <= 20:
        ax.legend(fontsize=6, markerscale=0.7)
    out = args.out or args.speakers_root / "projections.png"
    fig.savefig(out, dpi=150, bbox_inches="tight")
    print(f"Saved {out}")
