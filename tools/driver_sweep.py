"""Driver-emulation sweep: every queries() entry vs its oracle_sql() at
sf0.01 (or $GRAFT_ORACLE_SF_DIR), run from a FOREIGN cwd (catches
by-reference pickle leaks pytest cannot), 32 cpus.  Reuses the compare
helpers from tests/test_queries_vs_duckdb.py so the sweep and pytest can
never disagree on what "equal" means.

Usage: cd /tmp && python /root/repo/tools/driver_sweep.py [names...]
"""

from __future__ import annotations

import json
import math
import os
import sys
import time
import traceback

if os.getcwd() == "/root/repo":
    raise SystemExit(
        "run from a foreign cwd, e.g. cd /tmp && python /root/repo/tools/driver_sweep.py"
    )
os.environ.setdefault("GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")
# queries run on the SAME sf dir the oracle parquets were built for —
# a pre-set GRAFT_ORACLE_SF_DIR must move both sides together
SF = os.environ["GRAFT_ORACLE_SF_DIR"]
sys.path.insert(0, "/root/repo")

import duckdb  # noqa: E402
import pandas as pd  # noqa: E402
import ray  # noqa: E402

import __ray_entry__ as entrymod  # noqa: E402
from tests.test_queries_vs_duckdb import TABLES, _canon, _to_pandas  # noqa: E402


def main() -> None:
    ray.init(
        address="local", num_cpus=32, include_dashboard=False, logging_level="ERROR"
    )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{os.path.join(SF, t + '.parquet')}')"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    only = set(sys.argv[1:])
    unknown = only - set(qs)
    if unknown:  # a typo'd name must not read as "checked: 0, bad: []"
        raise SystemExit(f"unknown query names: {sorted(unknown)}")
    bad, checked, skipped = [], 0, 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        if name not in oracles:
            skipped += 1
            continue
        t0 = time.time()
        try:
            got = _canon(_to_pandas(fn(SF)))
            exp = _canon(con.execute(oracles[name]).fetchdf())
            ok = list(got.columns) == list(exp.columns) and len(got) == len(exp)
            if ok:
                for c in got.columns:
                    g, e = got[c], exp[c]
                    if pd.api.types.is_float_dtype(g) or pd.api.types.is_float_dtype(e):
                        eq = all(
                            (pd.isna(a) and pd.isna(b))
                            or (
                                not pd.isna(a)
                                and not pd.isna(b)
                                and math.isclose(a, b, rel_tol=1e-6, abs_tol=1e-6)
                            )
                            for a, b in zip(g, e)
                        )
                    else:
                        eq = g.astype(str).tolist() == e.astype(str).tolist()
                    if not eq:
                        ok = False
                        break
            status = "MATCH" if ok else "MISMATCH"
        except Exception:
            status = "ERROR: " + traceback.format_exc(limit=3).replace("\n", " | ")
            ok = False
        checked += 1
        if not ok:
            bad.append(name)
        print(f"{name}: {status} ({time.time() - t0:.1f}s)", flush=True)
    print(
        json.dumps({"checked": checked, "skipped_rows_only": skipped, "bad": bad}),
        flush=True,
    )
    ray.shutdown()


if __name__ == "__main__":
    main()
