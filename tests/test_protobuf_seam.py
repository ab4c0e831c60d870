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
import mapreduce_simple_go_spark._protobuf as P

P._FALLBACK_DIRS = tuple(json.loads(sys.argv[1]))
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
    removal of the first discovery path', with the host bundle gone)."""
    out = _probe([VENDORED])
    assert out["ensured"] and out.get("roundtrip")
    assert out["active"] == VENDORED or out["active"] is None  # real install wins if present


def test_host_bundle_still_usable_where_present():
    """The host-tooling path keeps working when the vendored zip is taken
    away (fallbacks are independent)."""
    if not os.path.isdir(os.path.join(HOST_BUNDLE, "google", "protobuf")):
        pytest.skip("host bundle not present on this machine")
    out = _probe([HOST_BUNDLE])
    assert out["ensured"] and out.get("roundtrip")


def test_no_fallbacks_no_crash():
    """With every fallback gone ensure_protobuf reports False (or a real
    install wins) — never raises; registration degrades, doesn't break."""
    out = _probe([])
    assert isinstance(out["ensured"], bool)


def test_vendored_zip_is_first_fallback_and_exists():
    """The deterministic vendored entry leads the probe order and ships in
    the repo — a silent 148->147 registration regression now requires
    deleting a tracked file, not a host-image change."""
    assert VENDORED.endswith(".zip") and os.path.isfile(VENDORED)
    assert _protobuf._FALLBACK_DIRS[0] == VENDORED
    assert _protobuf._entry_usable(VENDORED)
