"""Convert Praat TextGrid word alignments to the (words, end_times) format
used by silence-based utterance splitting (ref adapter:
scripts/textgrid_to_alignments.py; consumer:
rtvc_tpu/data/synthesizer_preprocess.split_on_silences).

Output: one ``<utt>.alignment.txt`` per TextGrid with two comma-separated
lines — quoted words ('' marks silence) and end times in seconds.
"""
import argparse
import re
from pathlib import Path


def parse_textgrid_words(text: str):
    """Minimal TextGrid parser: extract (xmax, word) intervals from the first
    item whose name contains 'word'."""
    items = re.split(r"item\s*\[\d+\]:", text)
    for item in items[1:]:
        name_m = re.search(r'name\s*=\s*"([^"]*)"', item)
        if name_m is None or "word" not in name_m.group(1).lower():
            continue
        words, ends = [], []
        for m in re.finditer(
            r'intervals\s*\[\d+\]:\s*xmin\s*=\s*([\d.]+)\s*xmax\s*=\s*([\d.]+)'
            r'\s*text\s*=\s*"([^"]*)"',
            item,
        ):
            ends.append(float(m.group(2)))
            words.append(m.group(3).strip())
        return words, ends
    return [], []


if __name__ == "__main__":
    parser = argparse.ArgumentParser(
        formatter_class=argparse.ArgumentDefaultsHelpFormatter
    )
    parser.add_argument("root", type=Path, help="Directory tree with .TextGrid files")
    args = parser.parse_args()

    n = 0
    for tg in sorted(args.root.glob("**/*.TextGrid")):
        words, ends = parse_textgrid_words(tg.read_text(errors="ignore"))
        if not words:
            continue
        out = tg.with_suffix(".alignment.txt")
        quoted = ",".join('"%s"' % w for w in words)
        times = ",".join("%.3f" % t for t in ends)
        out.write_text(quoted + "\n" + times + "\n")
        n += 1
    print("Converted %d TextGrids under %s" % (n, args.root))
