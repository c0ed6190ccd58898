"""Docs-honesty tests: the quickstart code blocks in docs/quickstart.md
execute verbatim against the current API (the analog of the reference's
executed sphinx examples — `docs/sphinx/source/quickstart.md` runs as a
myst notebook in its CI)."""

import pathlib
import re

DOCS = pathlib.Path(__file__).resolve().parent.parent / "docs"


def _python_blocks(md_path):
    text = md_path.read_text()
    return re.findall(r"```python\n(.*?)```", text, re.S)


def test_quickstart_executes():
    blocks = _python_blocks(DOCS / "quickstart.md")
    assert len(blocks) >= 2
    ns = {}
    # Block 0: config -> geometry -> viewing -> atmosphere -> engine -> run
    # (contains its own shape/positivity asserts). Block 1: the WF access.
    exec(blocks[0], ns)  # noqa: S102 - executing our own documentation
    exec(blocks[1], ns)  # noqa: S102
    wf = ns["wf"].to_numpy()
    assert wf.ndim == 4 and wf.shape[1] == 3  # (alt, wavelength, los, stokes)


def test_example_limb_ozone_wf_executes():
    """The worked retrieval example runs end-to-end, including its own
    error-reduction asserts (one Gauss-Newton step on the analytic
    Jacobian recovers the sensed altitudes)."""
    blocks = _python_blocks(DOCS / "examples" / "limb_ozone_wf.md")
    assert len(blocks) == 1
    exec(blocks[0], {})  # noqa: S102


def test_docs_pages_reference_real_symbols():
    """Every `sasktran2_tpu.<attr>` / `sk.<attr>` mention in the user's
    guide resolves on the package — docs cannot name symbols that don't
    exist."""
    import sasktran2_tpu as sk

    pages = list((DOCS / "users_guide").glob("*.md")) + [
        DOCS / "quickstart.md", DOCS / "index.md",
    ]
    missing = []
    for page in pages:
        for attr in re.findall(r"`sk\.([A-Za-z_][A-Za-z0-9_]*)", page.read_text()):
            if not hasattr(sk, attr):
                missing.append(f"{page.name}: sk.{attr}")
    assert not missing, missing
