"""The protobuf-discovery seam must survive host-environment drift.

``stream_user_totals_tws`` (the 148th registry entry) registers only when a
``google.protobuf`` runtime resolves. Round 7's discovery depended entirely
on a google-cloud-sdk install being present on the host — fragile by
construction (r7 verdict #5). Round 8 vendors the pure-Python runtime as a
zipimport-able archive inside the package; these tests prove each fallback
entry works ALONE, in a subprocess (discovery mutates process-global
sys.path/env, so isolation is mandatory), all the way through pyspark's
actual gencode (StateMessage_pb2) and a serialize/parse roundtrip — the
exact dependency the StatefulProcessor worker exercises.
"""

from __future__ import annotations

import os
import subprocess
import sys

import pytest

from mapreduce_simple_go_spark import _protobuf

VENDORED = _protobuf._FALLBACK_DIRS[0]
HOST_BUNDLE = _protobuf._FALLBACK_DIRS[1]

_PROBE = r"""
import json, sys
entries = json.loads(sys.argv[1])

# Block any REAL google.* install for this probe, so the fallback entries
# under test are exercised UNCONDITIONALLY. Without this, a host that has
# protobuf installed lets ensure_protobuf() return True before probing the
# zip and the test passes vacuously exactly where drift-proofing is meant
# to be guaranteed (r8 ADVICE). The finder vetoes any google.* spec whose
# origin resolves outside the entries under test; fallback-zip resolutions
# (origin prefixed by the entry path) pass through untouched.
import importlib.machinery as M

class _BlockRealInstall:
    def find_spec(self, name, path=None, target=None):
        if name.split(".")[0] != "google":
            return None
        spec = M.PathFinder.find_spec(name, path)
        if spec is not None and spec.origin and not any(
            spec.origin.startswith(e) for e in entries
        ):
            raise ModuleNotFoundError(
                "blocked real install: %s (%s)" % (name, spec.origin)
            )
        return spec

sys.meta_path.insert(0, _BlockRealInstall())

import mapreduce_simple_go_spark._protobuf as P

P._FALLBACK_DIRS = tuple(entries)
ok = P.ensure_protobuf()
out = {"ensured": ok, "active": P.active_fallback_dir()}
if ok:
    import google.protobuf as gp
    out["version"] = gp.__version__
    from pyspark.sql.streaming.proto import StateMessage_pb2 as SM
    m = SM.StateRequest()
    m2 = SM.StateRequest(); m2.ParseFromString(m.SerializeToString())
    out["roundtrip"] = True
print(json.dumps(out))
"""


def _probe(entries: list[str]) -> dict:
    import json

    env = dict(os.environ)
    # simulate "no real install leaked in": strip any PYTHONPATH additions a
    # prior in-process discovery exported
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run(
        [sys.executable, "-c", _PROBE, json.dumps(entries)],
        capture_output=True,
        text=True,
        env=env,
        timeout=120,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    return json.loads(r.stdout.strip().splitlines()[-1])


def test_vendored_zip_alone_satisfies_gencode():
    """Registration survives removal of every HOST discovery path: the
    vendored zip alone resolves google.protobuf and pyspark's gencode
    roundtrips (this is the r8 drift-proofing directive's 'survives
    removal of the first discovery path', with the host bundle gone).

    The probe blocks any real google.protobuf install, so this assertion
    is strict on EVERY host: the vendored zip must be the active runtime
    (no silent real-install escape — r8 ADVICE flagged the old
    `or active is None` clause as making the test vacuous exactly on
    hosts with protobuf installed)."""
    out = _probe([VENDORED])
    assert out["ensured"] and out.get("roundtrip")
    assert out["active"] == VENDORED


def test_host_bundle_still_usable_where_present():
    """The host-tooling path keeps working when the vendored zip is taken
    away (fallbacks are independent)."""
    if not os.path.isdir(os.path.join(HOST_BUNDLE, "google", "protobuf")):
        pytest.skip("host bundle not present on this machine")
    out = _probe([HOST_BUNDLE])
    assert out["ensured"] and out.get("roundtrip")


def test_no_fallbacks_no_crash():
    """With every fallback gone (and the real install blocked by the
    probe) ensure_protobuf reports False — never raises; registration
    degrades, doesn't break."""
    out = _probe([])
    assert out["ensured"] is False and out["active"] is None


def test_vendored_zip_is_first_fallback_and_exists():
    """The deterministic vendored entry leads the probe order and ships in
    the repo — a silent 148->147 registration regression now requires
    deleting a tracked file, not a host-image change."""
    assert VENDORED.endswith(".zip") and os.path.isfile(VENDORED)
    assert _protobuf._FALLBACK_DIRS[0] == VENDORED
    assert _protobuf._entry_usable(VENDORED)
