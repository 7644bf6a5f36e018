"""The GE2E sampler's constrained-random contract, checked against the
GENUINE reference RandomCycler (encoder/data_objects/random_cycler.py —
pure python, imported as-is): for n items and m total draws, each item
appears between m//n and (m-1)//n + 1 times, and at most 2(n-1) other
items separate two appearances of the same item. Both the reference class
and ours must satisfy it (same docstring guarantee)."""
import numpy as np

from rtvc_tpu.data.ge2e_sampler import RandomCycler as OurCycler
from tests.ref_oracle import ref_module


def _check_contract(cycler, n_items, m_draws):
    draws = cycler.sample(m_draws)
    assert len(draws) == m_draws
    counts = {i: draws.count(i) for i in set(draws)}
    lo, hi = m_draws // n_items, (m_draws - 1) // n_items + 1
    for item, c in counts.items():
        assert lo <= c <= hi, (item, c, lo, hi)
    last_seen = {}
    for pos, item in enumerate(draws):
        if item in last_seen:
            gap = pos - last_seen[item] - 1
            assert gap <= 2 * (n_items - 1), (item, gap)
        last_seen[item] = pos


class TestReferenceContract:
    def test_reference_cycler_contract(self):
        rc_mod = ref_module("encoder.data_objects.random_cycler")
        import random

        random.seed(0)
        for n, m in ((7, 100), (10, 10), (5, 4), (3, 50)):
            _check_contract(rc_mod.RandomCycler(list(range(n))), n, m)

    def test_our_cycler_same_contract(self):
        rng = np.random.default_rng(0)
        for n, m in ((7, 100), (10, 10), (5, 4), (3, 50)):
            try:
                cycler = OurCycler(list(range(n)), rng)
            except TypeError:
                cycler = OurCycler(list(range(n)))
            _check_contract(cycler, n, m)

    def test_both_reject_empty(self):
        rc_mod = ref_module("encoder.data_objects.random_cycler")
        import pytest

        with pytest.raises(Exception):
            rc_mod.RandomCycler([])
        with pytest.raises(Exception):
            OurCycler([])
