"""Per-part sf1 timing — the process rule that keeps catching real
scale bugs (the 430 s interval-join candidate product in round 2, the
100M-candidate boundary-day join in round 3), as a one-command tool.

    python tools/part_timer.py <part-or-query name> [more names...]
    python tools/part_timer.py --all-new <git-ref>   # parts touched since ref

Runs each named PARTS/REGISTRY builder against $PART_TIMER_SF_DIR
(default /tmp/sf1_synth — create it with tools/make_scaled_testdata.py
--perturb) with a noop write (so Catalyst cannot prune payload columns
the way .count() lets it) and prints cold + warm seconds. A non-dedup
part taking >2 min, or a warm time growing super-linearly vs sf0.1, is
a candidate-volume product until proven otherwise.
"""

from __future__ import annotations

import os
import subprocess
import sys
import time


def main(argv: list[str]) -> int:
    sf_dir = os.environ.get("PART_TIMER_SF_DIR", "/tmp/sf1_synth")
    if not os.path.isdir(sf_dir):
        print(
            f"{sf_dir} missing — run: python tools/make_scaled_testdata.py "
            "/root/testdata/sf0.1 /tmp/sf1_synth 10 --perturb",
            file=sys.stderr,
        )
        return 2

    names = argv
    if len(argv) == 2 and argv[0] == "--all-new":
        diff = subprocess.run(
            ["git", "diff", "--unified=0", argv[1], "--", "etl_property_rumah123_spark/plans"],
            capture_output=True, text=True, check=True,
        ).stdout
        import re

        # Anchor extraction to decorator call sites: a name only counts
        # when the added line IMMEDIATELY follows an added @part(/
        # @register( line (matching any quoted identifier in the diff
        # produced spurious NOT-FOUND hits from select-list columns).
        found = set()
        lines = diff.splitlines()
        for i, line in enumerate(lines):
            if re.match(r"^\+@(?:part|register)\($", line) and i + 1 < len(lines):
                m = re.match(r'^\+\s*"([a-z0-9_]+)",\s*$', lines[i + 1])
                if m:
                    found.add(m.group(1))
            else:
                # one-line form: +@part("name", ...) / +@register("name", ...)
                m = re.match(r'^\+@(?:part|register)\(\s*"([a-z0-9_]+)"', line)
                if m:
                    found.add(m.group(1))
        names = sorted(found)
        print(f"parts added since {argv[1]}: {names}")
    if not names:
        print(__doc__)
        return 2

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from etl_property_rumah123_spark.plans import PARTS, REGISTRY, load_all
    from etl_property_rumah123_spark.session import get_spark

    load_all()
    # The ENGINE session (AQE + coalesce + skew-join + arrow), not a
    # bare builder: the drill must measure the configured engine — a
    # raw no-AQE session with 32 fixed shuffle partitions mismeasures
    # big SFs (500 MB+ uncoalesced, unsplit partitions all spilling —
    # numbers in BASELINE.md §Round 11). Knobs for the decade drills:
    # PART_TIMER_SHUFFLE (initial partitions AQE coalesces down from;
    # raise to ~task-count x data-decades at sf100) and
    # PART_TIMER_DRIVER_MEM (16g suits sf10; 64g for sf100).
    spark = get_spark(
        app_name="part-timer",
        master=f"local[{os.cpu_count()}]",
        shuffle_partitions=int(os.environ.get("PART_TIMER_SHUFFLE", "32")),
        extra_conf={
            "spark.driver.memory": os.environ.get(
                "PART_TIMER_DRIVER_MEM", "16g"
            ),
            "spark.ui.enabled": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    rc = 0
    for name in names:
        spec = PARTS.get(name) or REGISTRY.get(name)
        if spec is None:
            print(f"{name}: NOT FOUND in PARTS/REGISTRY")
            rc = 1
            continue
        times = []
        for _ in range(2):
            t0 = time.time()
            spec.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            times.append(time.time() - t0)
        flag = "  <-- SLOW, investigate" if times[-1] > 120 else ""
        print(f"{name}: cold {times[0]:.2f}s, warm {times[1]:.2f}s{flag}")
    spark.stop()
    return rc


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
