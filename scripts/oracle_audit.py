#!/usr/bin/env python3
"""Standing oracle-portability audit (r11 verdict #7).

The entire r10 driver-red class shared ONE property: an oracle output
column DuckDB typed as HUGEINT (sum/count arithmetic over BIGINT), which
a different DuckDB version hashed differently than the engine's BIGINT.
The r11 round closed it with a one-off DESCRIBE-every-oracle audit
(PLANS.md "Round-11"); this script makes that audit a standing round-end
check so a driver-side DuckDB bump is caught before a round closes.

For every oracle in <outDir>/oracle_sql.json (a graft.Verify dump):
  - DESCRIBE the oracle over the real sfDir tables;
  - flag output columns typed HUGEINT/UHUGEINT (the proven red class);
  - flag DECIMAL outputs (cross-engine float formatting risk) as warn.

Usage: python3 scripts/oracle_audit.py <sfDir> <outDir> [auditJsonOut]
Exit 1 on any HUGEINT-class flag; warnings alone exit 0.
"""
import json
import os
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def audit_citations(src_root="src", ref_root="/root/reference"):
    """Citation-resolution audit (r13 verdict #4): every reference path
    cited in source scaladoc (demo_*/... or test_cases/... or scripts/...
    or any path ending .py) must resolve to a real file under the
    read-only reference tree — a fabricated citation is a provenance
    defect. Returns the list of (file, cited_path) that do NOT resolve.
    """
    import re
    pat = re.compile(
        r"(?:demo_[a-z_]+|test_cases|common|scripts)(?:/[A-Za-z0-9_.\-]+)+"
        r"\.(?:py|sh|sql|md|json|yaml)")
    flags = []
    if not os.path.isdir(ref_root):
        return flags
    for root, _dirs, files in os.walk(src_root):
        for fn in files:
            if not fn.endswith(".scala"):
                continue
            path = os.path.join(root, fn)
            with open(path, encoding="utf-8") as fh:
                text = fh.read()
            for cite in sorted(set(pat.findall(text))):
                # A cite may point at the reference tree or at the repo's
                # own tooling (e.g. scripts/selfcheck.py) — both are real.
                if os.path.exists(os.path.join(ref_root, cite)) or \
                        os.path.exists(cite):
                    continue
                # scaladoc line-wraps paths; also try the path relative to
                # any demo_* tree (a `common/...` cite is tree-relative).
                hits = []
                for rroot, _d, rfiles in os.walk(ref_root):
                    if os.path.basename(cite) in rfiles and \
                            rroot.endswith(os.path.dirname(cite)):
                        hits.append(rroot)
                if not hits:
                    flags.append({"file": path, "cited": cite,
                                  "why": "cited path not in reference"})
    return flags


def main(sf_dir, out_dir, audit_out=None):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.isdir(p):
            src = f"'{p}/*.parquet'"
        elif os.path.exists(p):
            src = f"'{p}'"
        else:
            continue
        sel = "*"
        if t == "events":
            typ = con.execute(
                f"SELECT typeof(ts) FROM {src} LIMIT 1").fetchone()[0]
            if typ == "BIGINT":
                sel = "* REPLACE (make_timestamp(ts // 1000) AS ts)"
        con.execute(f"CREATE VIEW {t} AS SELECT {sel} FROM {src}")

    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    report = {"duckdb_version": duckdb.__version__, "queries": {},
              "flags": [], "warns": [], "errors": [],
              "citation_flags": audit_citations()}
    for name in sorted(oracle):
        try:
            cols = con.execute(f"DESCRIBE {oracle[name]}").fetchall()
        except Exception as e:
            report["errors"].append({"query": name, "error": str(e)[:300]})
            continue
        types = {c[0]: c[1] for c in cols}
        report["queries"][name] = types
        for col, typ in types.items():
            base = typ.split("(")[0].upper()
            if base in ("HUGEINT", "UHUGEINT"):
                report["flags"].append(
                    {"query": name, "column": col, "type": typ,
                     "why": "uncast huge-integer output — the r10 red class"})
            elif base == "DECIMAL":
                report["warns"].append(
                    {"query": name, "column": col, "type": typ,
                     "why": "decimal output — engine float-format risk"})
    summary = (f"oracle_audit: {len(report['queries'])} oracles described, "
               f"{len(report['flags'])} HUGEINT flags, "
               f"{len(report['warns'])} decimal warns, "
               f"{len(report['errors'])} describe errors, "
               f"{len(report['citation_flags'])} unresolved citations "
               f"(duckdb {report['duckdb_version']})")
    report["summary"] = summary
    print(summary)
    for f in report["flags"]:
        print(f"  FLAG {f['query']}.{f['column']}: {f['type']}")
    for w in report["warns"]:
        print(f"  warn {w['query']}.{w['column']}: {w['type']}")
    for e in report["errors"]:
        print(f"  ERROR {e['query']}: {e['error']}")
    for c in report["citation_flags"]:
        print(f"  CITE {c['file']}: {c['cited']} does not resolve")
    if audit_out:
        with open(audit_out, "w") as fh:
            json.dump(report, fh, indent=1)
    return 1 if (report["flags"] or report["errors"]
                 or report["citation_flags"]) else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2],
                  sys.argv[3] if len(sys.argv) > 3 else None))
