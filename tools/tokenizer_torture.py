#!/usr/bin/env python3
"""Adversarial tokenizer-parity check: the Scala iterated peel vs the
recursive DuckDB CTE mirror, on inputs no driver corpus contains
(clitic chains, punct+clitic interleavings, acronym+clitic, quotes,
empty docs). The driver corpora carry zero apostrophes, so this is the
ONLY data path that exercises the clitic/peel SQL; run it after any
tokenizer or docTokCtes change:

    python3 tools/tokenizer_torture.py
    # expect: [ OK ] q36_tokenize / [ OK ] q49_wordpiece_pool

Builds /tmp/sf_torture (9 tables copied from sf0.001 + a torture
documents.parquet), runs graft.Verify on q36/q49 there, then the same
check_oracle DuckDB compare the driver uses.
"""
import shutil, subprocess, sys
import pyarrow as pa, pyarrow.parquet as pq

TEXTS = [
    "the quick brown fox",
    "E?,,Qd\"'s cu),BjWbMA298g 4'6m0VaSsu(5tQx)!c0d9",
    "x's's y're've",
    "U.S.'s Pataki's plan, a 3.5 percent cut.",
    "He didn't go (yet). don'tn't",
    "Bob's. do,n't x''s ''s",
    "'s 're 've 'll 'd 'm n't",
    "\"'s \"quoted\" (paren'd) [brack't]",
    "a\"'s's trailing... multi?!?",
    "17,000 U.S. soldiers' 's.",
    "",
    "wu'S 'S 'RE 'VE 'LL 'D 'M N'T",
    "it's isn't won't can't shan't o'clock",
]

def main():
    sf = "/tmp/sf_torture"
    out = "/tmp/verify_torture"
    shutil.rmtree(sf, ignore_errors=True)
    shutil.rmtree(out, ignore_errors=True)
    import os
    os.makedirs(sf)
    for t in ["region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "embeddings"]:
        shutil.copy(f"/root/testdata/sf0.001/{t}.parquet", f"{sf}/{t}.parquet")
    tbl = pa.table({
        "doc_id": pa.array(range(len(TEXTS)), pa.int64()),
        "text": pa.array(TEXTS, pa.string()),
        "lang": pa.array(["en"] * len(TEXTS), pa.string()),
        "source": pa.array(["torture"] * len(TEXTS), pa.string()),
        "n_chars": pa.array([len(x) for x in TEXTS], pa.int64())})
    pq.write_table(tbl, f"{sf}/documents.parquet")
    subprocess.run(
        ["sbt", "-batch",
         f"runMain graft.Verify {sf} {out} q36_tokenize,q49_wordpiece_pool"],
        env={**os.environ, "SPARK_GRAFT_CPUS": "8"}, check=True,
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
    r = subprocess.run(
        [sys.executable, "tools/check_oracle.py", sf, out],
        capture_output=True, text=True)
    lines = [l for l in r.stdout.splitlines() if "q36" in l or "q49" in l]
    print("\n".join(lines))
    ok = all(l.startswith("[ OK ]") for l in lines) and len(lines) == 2
    sys.exit(0 if ok else 1)

if __name__ == "__main__":
    main()
