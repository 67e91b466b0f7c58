"""Guard the read-only reference mount against accidental writes.

Round 1 had an incident where a CLI path-traversal bug overwrote two
reference golden PNGs (since resolved).  This test pins a SHA-256 of
EVERY file under /root/reference.  Before round 3 the mount was refreshed
with the PRISTINE originals (and is now kernel-enforced read-only:
r--r--r-- on a read-only mount) — the manifest pins those originals, so
every golden comparison in the suite is against authentic reference
device outputs.

Any mismatch means something wrote into the reference checkout — fail
loudly and immediately so the damage is caught, not survived.
"""

from __future__ import annotations

import hashlib
import json
import os

import pytest

REFERENCE_ROOT = "/root/reference"
MANIFEST = os.path.join(os.path.dirname(__file__), "data",
                        "reference_manifest.json")


def _sha256(path: str) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


@pytest.fixture(scope="module")
def manifest():
    if not os.path.isdir(REFERENCE_ROOT):
        pytest.skip("reference mount not present")
    with open(MANIFEST) as f:
        return json.load(f)


def test_no_files_added_or_removed(manifest):
    found = set()
    for dirpath, _, filenames in os.walk(REFERENCE_ROOT):
        for fn in filenames:
            found.add(os.path.relpath(os.path.join(dirpath, fn),
                                      REFERENCE_ROOT))
    expected = set(manifest)
    assert found - expected == set(), (
        f"files ADDED to the reference mount: {sorted(found - expected)}")
    assert expected - found == set(), (
        f"files MISSING from the reference mount: {sorted(expected - found)}")


def test_all_artifacts_unmodified(manifest):
    bad = [rel for rel, digest in sorted(manifest.items())
           if _sha256(os.path.join(REFERENCE_ROOT, rel)) != digest]
    assert bad == [], (
        "reference artifacts MODIFIED since the manifest was taken "
        f"(something wrote into /root/reference): {bad}")
