"""All genuine-reference parity tests are marked slow: they instantiate the
reference torch models and compile full JAX graphs (~10-20 s each on the
1-core CI box). They run in the full gate (make test-all)."""
from pathlib import Path

import pytest

_HERE = Path(__file__).parent


def pytest_collection_modifyitems(items):
    # NB: this hook sees ALL collected items (conftest hooks are not
    # directory-scoped) — only mark the ones that live in this package.
    # When the genuine reference tree is absent, the oracles SKIP (the
    # repo's own tests/benches must stand alone — round-3 verdict item 7).
    no_ref = not Path("/root/reference").is_dir()
    for item in items:
        if _HERE in Path(str(item.fspath)).parents:
            item.add_marker(pytest.mark.slow)
            if no_ref:
                item.add_marker(pytest.mark.skip(
                    reason="/root/reference not present"
                ))
