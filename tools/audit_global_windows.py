"""Registry-wide audit of the unpartitioned-Window anti-pattern.

The pinned test (tests/test_plans.py::
test_headline_no_unbounded_global_windows) sweeps the HEADLINE set
every pytest run; this tool runs the same detection over the ENTIRE
registry so each round can check whether any non-headline query still
plans a single-task global sort.  Flagged != wrong — the output is
the triage list (bounded grain vs fact grain) for the next round's
rewrite budget.

Since round 10 the registry-wide sweep is ALSO pinned as an opt-in
test with an exact two-sided allowlist —
``SPARK_GRAFT_SLOW=1 pytest tests/test_registry_window_audit.py`` —
so prefer that for the round-close check; this tool remains the
interactive triage view (it prints the window expressions).

Run: python tools/audit_global_windows.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

from k_means_hadoop_spark import registry
from k_means_hadoop_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    from test_plans import _unbounded_global_windows  # the pinned detector

    spark = get_spark("audit-global-windows")
    spark.sparkContext.setLogLevel("ERROR")
    flagged, errors = {}, {}
    for name in registry.QUERIES:
        try:
            w = _unbounded_global_windows(registry.QUERIES[name](spark, sf_dir))
            if w:
                flagged[name] = w
        except Exception:
            errors[name] = traceback.format_exc(limit=1).splitlines()[-1]
    print(f"flagged: {len(flagged)} of {len(registry.QUERIES)}")
    for name, w in sorted(flagged.items()):
        print(f"  {name}")
        for x in w:
            print(f"    {x}")
    if errors:
        print(f"build errors: {len(errors)}")
        for name, e in sorted(errors.items()):
            print(f"  {name}: {e}")


if __name__ == "__main__":
    main()
