"""Host-environment probes shared by the measurement harnesses.

The r9 sf10 sweep and the r11 sf1 isolated re-measure trail were both
contaminated by co-scheduled Spark work (a verify bench mid-sweep; sweep
co-scheduling during re-measures) — readings taken while another JVM
competes for the same cores show exactly the uniform inflation the noise
vetting exists to catch. scale_sweep.py grew the detection in r9;
bench.py's isolated re-measure path reuses it from here since r12.
"""

from __future__ import annotations

import os


def spark_jvms(exclude_children_of: int | None = None) -> list[int]:
    """PIDs of Spark JVMs currently running on this host.

    ``exclude_children_of``: skip JVMs whose direct parent is the given
    pid — a live measurement parent (bench.py during an isolated
    re-measure) owns exactly one idle gateway JVM that must not count as
    foreign load.
    """
    pids: list[int] = []
    for d in os.listdir("/proc"):
        if not d.isdigit() or int(d) == os.getpid():
            continue
        try:
            with open(f"/proc/{d}/cmdline", "rb") as f:
                cmd = f.read().decode("utf-8", "replace")
        except OSError:
            continue
        if "java" in cmd.split("\0", 1)[0] and (
            "org.apache.spark" in cmd or "pyspark-shell" in cmd
        ):
            if exclude_children_of is not None:
                try:
                    with open(f"/proc/{d}/stat") as f:
                        ppid = int(f.read().split(")")[-1].split()[1])
                except (OSError, ValueError, IndexError):
                    ppid = -1
                if ppid == exclude_children_of:
                    continue
            pids.append(int(d))
    return pids
