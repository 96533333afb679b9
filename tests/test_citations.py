"""Lint: every ``*.java`` reference citation in package source resolves.

The repo's parity story rests on ``path:line`` citations into
``/root/reference`` being checkable; a fabricated filename (round 7 shipped
``dedup/SpeedupDeDuplicator.java``, which does not exist) silently breaks
that contract. This lint extracts every ``….java`` token from the package's
Python sources and asserts it names a real file in the reference tree —
matched by path suffix when a directory is cited (``orc/net/Foo.java``),
by basename when cited bare (``Foo.java``).
"""

from __future__ import annotations

import pathlib
import re

import pytest

PKG = pathlib.Path(__file__).resolve().parents[1] / "columnar_aware_dedup_spark"
REFERENCE = pathlib.Path("/root/reference")

_JAVA_CITATION = re.compile(r"[A-Za-z0-9_./-]+\.java")


def _reference_java_files() -> list[pathlib.PurePosixPath]:
    return [
        pathlib.PurePosixPath(p.relative_to(REFERENCE).as_posix())
        for p in REFERENCE.rglob("*.java")
    ]


def _resolves(cited: str, ref_files: list[pathlib.PurePosixPath]) -> bool:
    if cited.startswith(str(REFERENCE) + "/"):
        cited = cited[len(str(REFERENCE)) + 1 :]
    cited_path = pathlib.PurePosixPath(cited.lstrip("./"))
    if len(cited_path.parts) == 1:
        return any(f.name == cited_path.name for f in ref_files)
    n = len(cited_path.parts)
    return any(f.parts[-n:] == cited_path.parts for f in ref_files)


@pytest.mark.skipif(not REFERENCE.exists(), reason="reference tree not mounted")
def test_every_java_citation_resolves_to_a_reference_file():
    ref_files = _reference_java_files()
    assert ref_files, "reference tree mounted but holds no .java files"
    bad: list[str] = []
    for src in sorted(PKG.rglob("*.py")):
        text = src.read_text(encoding="utf-8")
        for cited in set(_JAVA_CITATION.findall(text)):
            if not _resolves(cited, ref_files):
                bad.append(f"{src.relative_to(PKG.parent)}: {cited}")
    assert not bad, "fabricated .java citations:\n" + "\n".join(sorted(bad))
