"""Minimal Praat TextGrid interval parser shared by the MFA-alignment stats
tools (replacing the reference's ``tgt`` dependency, ref:
scripts/textgrid_stats.py:14)."""
from __future__ import annotations

import re
from typing import Dict, List, Tuple

_INTERVAL = re.compile(
    r'intervals\s*\[\d+\]:\s*xmin\s*=\s*([\d.eE+-]+)\s*xmax\s*=\s*([\d.eE+-]+)'
    r'\s*text\s*=\s*"([^"]*)"'
)


def parse_textgrid_tiers(text: str) -> Dict[str, List[Tuple[float, float, str]]]:
    """TextGrid source → {tier_name: [(xmin, xmax, text), ...]}."""
    tiers: Dict[str, List[Tuple[float, float, str]]] = {}
    for item in re.split(r"item\s*\[\d+\]:", text)[1:]:
        name_m = re.search(r'name\s*=\s*"([^"]*)"', item)
        if name_m is None:
            continue
        tiers[name_m.group(1)] = [
            (float(m.group(1)), float(m.group(2)), m.group(3).strip())
            for m in _INTERVAL.finditer(item)
        ]
    return tiers
