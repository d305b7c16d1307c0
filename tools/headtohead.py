#!/usr/bin/env python3
"""One-command repro of the reference-vs-graft head-to-head
(BASELINE.md "throughput head-to-head" row; PERF.md "Reference
head-to-head" table).

Usage: python3 tools/headtohead.py [--sizes 5000,50000] [--big]

For each corpus size it:
  1. builds a one-doc-per-line text corpus ("<doc_id> <text>") by
     replicating /root/testdata/sf0.1/documents.parquet with fresh ids,
  2. runs the REFERENCE (/root/reference/app.py) under python3/PySpark
     with the same three-line compatibility patch SURVEY.md §0.1
     documents (py2 ascii-encode → identity, hard-coded gene filter →
     pass-through, hard-coded input file → argv[2]) — patched copy is
     written to /tmp at run time, never into this repo,
  3. runs graft.Main (java -cp, local[32] and the reference-fair
     local[1]) on the same file with the same query term,
and prints a timing table plus both top-5 outputs so result parity is
visible, not just speed.

--big adds the 500k-doc corpus with a 600 s timeout on the reference
(it has never finished that size; ours runs it in under a minute).

Dev/judge tool only — the engine itself has no Python dependency.
"""
import argparse
import os
import re
import subprocess
import sys
import tempfile
import time
from collections import Counter

import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DOCS_PARQUET = "/root/testdata/sf0.1/documents.parquet"
REFERENCE = "/root/reference/app.py"
SPARK_JARS = "/opt/spark/jars"

# must match build.sbt's jdk17AddOpens (Spark 4 on JDK 17 outside spark-submit)
ADD_OPENS = [
    f"--add-opens={p}=ALL-UNNAMED"
    for p in (
        "java.base/java.lang", "java.base/java.lang.invoke",
        "java.base/java.lang.reflect", "java.base/java.io",
        "java.base/java.net", "java.base/java.nio",
        "java.base/java.util", "java.base/java.util.concurrent",
        "java.base/java.util.concurrent.atomic",
        "java.base/sun.nio.ch", "java.base/sun.nio.cs",
        "java.base/sun.security.action", "java.base/sun.util.calendar",
    )
]


def build_corpus(n_docs: int, path: str) -> str:
    """Replicate the sf0.1 documents with fresh doc ids up to n_docs
    lines; returns the corpus's highest-df term (the query both engines
    get — same derivation as Semantic.queryTermFrom)."""
    base = pd.read_parquet(DOCS_PARQUET, columns=["doc_id", "text"])
    df_counter = Counter()
    with open(path, "w") as f:
        written = 0
        replica = 0
        while written < n_docs:
            for _, row in base.iterrows():
                doc_id = int(row.doc_id) + replica * 10_000_000
                text = row.text.replace("\n", " ")
                f.write(f"{doc_id} {text}\n")
                written += 1
                if written >= n_docs:
                    break
            replica += 1
    # document frequency over the base replica is the same ranking as
    # over the whole corpus (replicas are copies)
    for _, row in base.iterrows():
        df_counter.update(set(t for t in row.text.split() if t))
    # max df, ties lexicographically-min — Semantic.queryTermFrom's
    # orderBy(df.desc, term)
    return min(df_counter.items(), key=lambda kv: (-kv[1], kv[0]))[0]


def patch_reference(dst: str) -> None:
    """The SURVEY §0.1 three-line compatibility patch, applied by
    regex so we never vendor reference code into the repo."""
    with open(REFERENCE) as f:
        src = f.read()
    # 1. python-2 ascii fold crashes under python3 (bytes have no split)
    src = src.replace(
        'data = data.map(lambda x: x.encode("ascii", "ignore"))',
        "data = data  # patched: identity (py3)")
    # 2. the hard-coded gene_*_gene predicate keeps nothing on a
    #    non-genomics corpus
    src = re.sub(
        r"term_tfidf = term_tfidf\.filter\(lambda x: 'gene_' == [^\n]+\n",
        "term_tfidf = term_tfidf  # patched: no gene filter\n",
        src)
    # 3. input file from argv instead of the hard-coded name
    src = src.replace('file = "project2_test.txt"', "file = argv[2]")
    assert "patched" in src and "argv[2]" in src, "reference patch failed to apply"
    with open(dst, "w") as f:
        f.write(src)


def run_timed(cmd, env=None, timeout=None):
    t0 = time.time()
    try:
        r = subprocess.run(cmd, capture_output=True, text=True,
                           env=env, timeout=timeout)
        return time.time() - t0, r.returncode, r.stdout, r.stderr
    except subprocess.TimeoutExpired:
        return time.time() - t0, -1, "", f"TIMEOUT after {timeout}s"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="5000,50000")
    ap.add_argument("--big", action="store_true", help="add the 500k corpus")
    ap.add_argument("--ref-timeout", type=int, default=600)
    args = ap.parse_args()
    sizes = [int(s) for s in args.sizes.split(",")]
    if args.big:
        sizes.append(500_000)

    classes = os.path.join(REPO, "target", "scala-2.13", "classes")
    if not os.path.isdir(classes):
        print("compile first: sbt compile", file=sys.stderr)
        sys.exit(1)
    cp = f"{classes}:{SPARK_JARS}/*"

    ref_py = os.path.join(tempfile.mkdtemp(prefix="headtohead_"), "app_patched.py")
    patch_reference(ref_py)

    rows = []
    for n in sizes:
        corpus = f"/tmp/headtohead_corpus_{n}.txt"
        query = build_corpus(n, corpus)
        print(f"\n=== {n} docs, query term: {query} ===", flush=True)

        env = dict(os.environ)
        ref_t, ref_rc, ref_out, ref_err = run_timed(
            ["python3", ref_py, query, corpus],
            env=env, timeout=args.ref_timeout)
        ref_cell = f"{ref_t:.1f} s" if ref_rc == 0 else \
            f">{args.ref_timeout} s (timeout)" if ref_rc == -1 else f"FAILED rc={ref_rc}"
        print(f"reference (local, 1 core): {ref_cell}")
        if ref_rc == 0:
            print(ref_out.strip()[-400:])
        elif ref_rc not in (0, -1):
            print(ref_err.strip()[-400:], file=sys.stderr)

        results = {}
        for master, label in (("local[32]", "graft local[32]"), ("local[1]", "graft local[1]")):
            env_g = dict(os.environ, SPARK_MASTER=master,
                         SPARK_GRAFT_CPUS=master[6:-1])
            g_t, g_rc, g_out, g_err = run_timed(
                ["java", *ADD_OPENS, "-Xmx16g",
                 "-Dspark.ui.enabled=false", "-cp", cp,
                 "graft.Main", corpus, query],
                env=env_g, timeout=args.ref_timeout)
            cell = f"{g_t:.1f} s" if g_rc == 0 else f"FAILED rc={g_rc}"
            results[label] = cell
            print(f"{label}: {cell}")
            if g_rc == 0:
                print(g_out.strip()[-400:])
            else:
                print(g_err.strip()[-800:], file=sys.stderr)
        rows.append((n, ref_cell, results["graft local[32]"], results["graft local[1]"]))

    print("\n| corpus | reference (1 core) | graft local[32] | graft local[1] |")
    print("|---|---|---|---|")
    for n, a, b, c in rows:
        print(f"| {n} docs | {a} | {b} | {c} |")


if __name__ == "__main__":
    main()
