"""Execute every tutorial's python blocks so the docs cannot rot.

Mirrors the reference's executed-notebook tier
(``/root/reference/Makefile:41-44``: tutorials are run, not just
rendered).  Each ``docs/tutorials/*.md`` file's ```python blocks are
concatenated in order and exec'd in one fresh namespace — tutorials must
therefore be self-contained, defining any data they use.
"""

import pathlib
import re

import pytest

import pyro_tpu

pytestmark = pytest.mark.stage("integration")

DOCS = sorted(
    (pathlib.Path(__file__).parent.parent / "docs" / "tutorials").glob(
        "*.md"
    )
)
assert DOCS, "tutorial directory is empty"


def _blocks(path):
    return re.findall(r"```python\n(.*?)```", path.read_text(), re.S)


@pytest.mark.parametrize("path", DOCS, ids=[p.stem for p in DOCS])
def test_tutorial_executes(path):
    code = "\n".join(_blocks(path))
    assert code.strip(), f"{path} has no python blocks"
    pyro_tpu.clear_param_store()
    pyro_tpu.set_rng_seed(0)
    namespace = {"__name__": f"tutorial_{path.stem}"}
    exec(compile(code, str(path), "exec"), namespace)
