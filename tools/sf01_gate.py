#!/usr/bin/env python3
"""sf0.1 heavy-tier correctness artifact (round-9; round-7/8 verdict carry-over).

The per-round gate hash-proves every query at sf0.01. This runs the SAME
Verify-output-vs-DuckDB-oracle compare at sf0.1, where some pair-tier
oracles (all-candidate shingle/minhash replays in SQL) are too slow for
DuckDB at 5 000 docs. Protocol:

  1. `graft.Verify` runs ALL queries at full sf0.1 -> outFull.
  2. Each oracle gets `--timeout` seconds of DuckDB time (default 180).
     Queries whose oracle times out are re-verified on the SLICE fixture
     (documents truncated to its first 2 000 doc_ids, every other table
     verbatim -- build with --make-slice), where the same oracle completes.
  3. Results merge into one JSON artifact: per query
     {status, rows, tier: "full" | "pairslice"}.

Usage:
  python3 tools/sf01_gate.py --make-slice <sfDir> <sliceDir>
  python3 tools/sf01_gate.py <outFull> <sfDir> [--timeout=180] [--out=FILE]
                             [--declared=q1,q2]   # pre-declared slice tier
  python3 tools/sf01_gate.py --merge <jsonFull> <jsonSlice> --out=FILE [--sf=1]

The same protocol runs at any sf (sf1 gate, round 12): point the full run
at the bigger dir, --make-slice that dir for the pairslice tier, and
--declared the known quadratic-oracle set so it doesn't burn full-tier
timeouts.

Dev tooling only (like selfcheck.py) -- not part of the Scala library.
"""
import json, os, subprocess, sys, time

HERE = os.path.dirname(os.path.abspath(__file__))


def make_slice(sf_dir: str, dst: str) -> None:
    import duckdb
    os.makedirs(dst, exist_ok=True)
    tables = "region nation customer supplier part orders lineitem events documents embeddings".split()
    con = duckdb.connect()
    for t in tables:
        src = f"{sf_dir}/{t}.parquet"
        if not os.path.exists(src):
            continue
        if t == "documents":
            con.execute(
                f"COPY (SELECT * FROM '{src}' ORDER BY doc_id LIMIT 2000) "
                f"TO '{dst}/{t}.parquet' (FORMAT PARQUET)")
        else:
            con.execute(
                f"COPY (SELECT * FROM '{src}') TO '{dst}/{t}.parquet' (FORMAT PARQUET)")
    print("slice ->", dst)


def run_gate(out_dir: str, sf_dir: str, timeout: int, tier: str,
             declared=()) -> dict:
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    results = {}
    for name in sorted(oracle):
        if name in declared:
            # tier declared up front (round-11 verdict: the known
            # quadratic-oracle set shouldn't burn its timeout in the full
            # tier every round) — recorded as a timeout so --merge replaces
            # it with the slice-tier row like any measured timeout
            results[name] = {"status": "oracle_timeout", "tier": tier,
                             "declared": True}
            continue
        if not os.path.isdir(f"{out_dir}/{name}"):
            results[name] = {"status": "missing_output", "tier": tier}
            continue
        t0 = time.time()
        try:
            p = subprocess.run(
                [sys.executable, f"{HERE}/selfcheck.py", out_dir, sf_dir, name],
                capture_output=True, text=True, timeout=timeout)
            line = next((l for l in p.stdout.splitlines()
                         if l.startswith(("PASS", "FAIL", "SKIP"))), "")
            if line.startswith("PASS"):
                # tolerate a PASS line without the expected "(N rows" shape:
                # record it unparsed instead of aborting the whole gate run
                try:
                    rows = int(line.split("(")[1].split(" ")[0])
                    results[name] = {"status": "pass", "rows": rows,
                                     "tier": tier,
                                     "oracle_sec": round(time.time() - t0, 1)}
                except (IndexError, ValueError):
                    results[name] = {"status": "unparsed", "tier": tier,
                                     "detail": line[:300]}
            elif line.startswith("SKIP"):
                results[name] = {"status": "rows_only", "tier": tier}
            else:
                detail = line if line else "no PASS/FAIL/SKIP line in output"
                stderr_tail = (p.stderr or "").strip()[-200:]
                results[name] = {"status": "fail", "tier": tier,
                                 "detail": (detail + (" | stderr: " + stderr_tail
                                            if stderr_tail else ""))[:500]}
        except subprocess.TimeoutExpired:
            results[name] = {"status": "oracle_timeout", "tier": tier,
                             "timeout_sec": timeout}
        print(name, results[name]["status"], flush=True)
    return results


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    flags = {a.split("=")[0][2:]: (a.split("=", 1)[1] if "=" in a else "1")
             for a in sys.argv[1:] if a.startswith("--")}
    if "make-slice" in flags:
        make_slice(args[0], args[1])
        return
    if "merge" in flags:
        full = json.load(open(args[0]))
        sl = json.load(open(args[1]))
        merged = dict(full)
        for k, v in sl.items():
            # the slice result replaces a full-tier timeout; anything else
            # from the slice run is advisory only
            if merged.get(k, {}).get("status") == "oracle_timeout":
                merged[k] = v
        counts = {}
        for v in merged.values():
            counts[v["status"]] = counts.get(v["status"], 0) + 1
        out = {"sf": flags.get("sf", "0.1"),
               "protocol": flags.get(
                   "protocol", "full + 2000-doc pairslice for oracle timeouts"),
               "counts": counts, "queries": merged}
        body = json.dumps(out, indent=1, sort_keys=True)
        print(body if "out" not in flags else counts)
        if "out" in flags:
            open(flags["out"], "w").write(body)
        return
    declared = set(flags.get("declared", "").split(",")) - {""}
    res = run_gate(args[0], args[1], int(flags.get("timeout", "180")),
                   flags.get("tier", "full"), declared)
    if "out" in flags:
        open(flags["out"], "w").write(json.dumps(res, indent=1, sort_keys=True))


if __name__ == "__main__":
    main()
