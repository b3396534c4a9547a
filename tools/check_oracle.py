#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate: run graft.Verify output
against DuckDB on the same parquet tables and diff per query.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>
"""
import json
import sys

import duckdb
import pyarrow.parquet as pq
import pandas as pd
from pathlib import Path

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("datetime64[us]")
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
        else:
            try:
                df[c] = pd.to_numeric(df[c])
            except Exception:
                pass
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def type_key(t) -> str:
    """Canonical type string for the driver-faithful schema compare.

    Timestamps collapse to 'timestamp' (unit/tz are storage detail) and
    string variants to 'string', but integer widths and decimals stay
    distinct — DuckDB's HUGEINT (arrow decimal128) vs Spark's BIGINT is a
    REAL driver hash mismatch and must fail here too.
    """
    s = str(t)
    if s.startswith("timestamp"):
        return "timestamp"
    if s in ("large_string", "string", "utf8", "large_utf8"):
        return "string"
    if s.startswith(("int", "uint")):
        # the driver's value hash sees Python ints: widths are equivalent
        return "int"
    if s.startswith("halffloat") or s == "float":
        return "float32"
    if s == "double":
        return "float64"
    return s


def schema_diff(got_tbl, want_tbl):
    g = {f.name: type_key(f.type) for f in got_tbl.schema}
    w = {f.name: type_key(f.type) for f in want_tbl.schema}
    if g == w:
        return None
    return f"typed schema differs: spark={sorted(g.items())} duck={sorted(w.items())}"


def main(sf_dir, out_dir):
    out = Path(out_dir)
    oracle = json.loads((out / "oracle_sql.json").read_text())
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    ok, bad = [], []
    for name, sql in sorted(oracle.items()):
        pdir = out / name
        if not pdir.exists():
            bad.append((name, "spark result missing"))
            continue
        try:
            got_tbl = pq.read_table(str(pdir))
            want_tbl = con.execute(sql).arrow()
            tdiff = schema_diff(got_tbl, want_tbl)
            if tdiff:
                bad.append((name, tdiff))
                continue
            got = canon(got_tbl.to_pandas())
            want = canon(want_tbl.to_pandas())
        except Exception as e:
            bad.append((name, f"error: {e}"))
            continue
        if list(got.columns) != list(want.columns):
            bad.append((name, f"columns differ: spark={list(got.columns)} duck={list(want.columns)}"))
            continue
        if len(got) != len(want):
            bad.append((name, f"row count: spark={len(got)} duck={len(want)}"))
            continue
        try:
            eq = got.equals(want)
            if not eq:
                # tolerate dtype mismatch but not value mismatch
                eq = (got.astype(str).reset_index(drop=True)
                      .equals(want.astype(str).reset_index(drop=True)))
            if eq:
                ok.append(name)
            else:
                diff = (got != want)
                cells = int(diff.sum().sum())
                firstbad = diff.any(axis=1)
                idx = firstbad[firstbad].index[:3].tolist()
                detail = "; ".join(
                    f"row{i}: spark={got.iloc[i].to_dict()} duck={want.iloc[i].to_dict()}"
                    for i in idx)
                bad.append((name, f"{cells} differing cells. {detail}"))
        except Exception as e:
            bad.append((name, f"compare error: {e}"))
    # rows-only entries: every written parquet without oracle must be nonempty
    for pdir in sorted(out.iterdir()):
        if pdir.is_dir() and pdir.name not in oracle:
            n = pq.read_table(str(pdir)).num_rows
            (ok if n > 0 else bad).append(
                pdir.name + f" [rows-only n={n}]" if n > 0 else (pdir.name, "EMPTY rows-only result"))

    # First-principles recompute of the two arithmetic golden pins
    # (VERDICT r4 #7): their VALUES oracles were generated from the
    # engine's own output, so the normal compare above is circular for
    # them. Recompute the expected rows directly from documents.parquet
    # with an independent pure-Python implementation (xxh64 from the
    # public spec + the documented scoring rules) and require the PIN to
    # match the recompute.
    import golden_recompute as gr
    docs = pq.read_table(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"]).to_pandas()
    recomputed = {
        "q_sentiment_buckets": pd.DataFrame(
            gr.sentiment_buckets(docs["text"]),
            columns=["label", "cnt", "score_milli_sum"]),
        "q_text_fingerprint": pd.DataFrame(
            gr.fingerprints(zip(docs["doc_id"], docs["text"])),
            columns=["doc_id", "fp"]),
        "q_dedup_simhash": pd.DataFrame(
            gr.simhash_pairs(zip(docs["doc_id"], docs["text"])),
            columns=["id_a", "id_b", "hamming"]),
        "q_multimodal_resize": pd.DataFrame(
            gr.multimodal_resize(),
            columns=["kind", "cnt", "sum_w", "sum_h", "max_dim"]),
    }
    for name, rec in recomputed.items():
        if name not in oracle:
            bad.append((name + " [recompute]", "query missing from oracle_sql.json"))
            continue
        try:
            pin = canon(con.execute(oracle[name]).arrow().to_pandas())
            rec = canon(rec)
            if (pin.astype(str).reset_index(drop=True)
                    .equals(rec.astype(str).reset_index(drop=True))):
                ok.append(name + " [independent recompute == pin]")
            else:
                bad.append((name + " [recompute]",
                            f"pin != first-principles recompute:\n"
                            f"pin:\n{pin}\nrecompute:\n{rec}"))
        except Exception as e:
            bad.append((name + " [recompute]", f"error: {e}"))
    print(f"== OK ({len(ok)}):")
    for n in ok:
        print("  ", n)
    print(f"== BAD ({len(bad)}):")
    for n, why in bad:
        print("  ", n, "→", why)
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
