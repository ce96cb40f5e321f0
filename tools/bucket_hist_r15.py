"""Per-bucket size / candidate-count histogram for the sign-LSH band join
behind ops_embedding_near_dup (VERDICT r14 item 8): is the verify join
candidate-bounded or bucket-skew-bounded at band_bits=8?

Per (band, chunk) bucket of size s the self-join emits C(s,2) candidate
pairs, so skew shows up as a heavy tail in s and a superlinear tail in
pairs.  Prints the bucket-size distribution, the top buckets by pair
count, and max/median ratios (guide §2.5's skew test), at each sf dir
given (default sf0.01 + sf0.1).

Run: python tools/bucket_hist_r15.py [sf_dir ...]
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    dirs = sys.argv[1:] or ["/root/testdata/sf0.01", "/root/testdata/sf0.1"]

    from pyspark.sql import functions as F

    from arcane_stream_microsoft_synapse_link_spark.catalog import Tables
    from arcane_stream_microsoft_synapse_link_spark.functions import similarity as S
    from arcane_stream_microsoft_synapse_link_spark.session import get_spark

    spark = get_spark("bucket-hist-r15")
    spark.sparkContext.setLogLevel("ERROR")
    out = {}
    for sf_dir in dirs:
        t = Tables(spark, sf_dir)
        emb = t.embeddings
        dim = len(emb.select("embedding").first()[0])
        sig = S.embedding_sign_signatures(emb, dim, seed=42)
        band_bits = 8
        nbands = 64 // band_bits
        mask = (1 << band_bits) - 1
        banded = sig.select(
            "_id",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(b).alias("band"),
                            F.shiftright(F.col("_sim"), b * band_bits)
                            .bitwiseAND(F.lit(mask))
                            .alias("chunk"),
                        )
                        for b in range(nbands)
                    ]
                )
            ).alias("bb"),
        ).select("_id", "bb.band", "bb.chunk")
        sizes = (
            banded.groupBy("band", "chunk")
            .agg(F.count("*").alias("s"))
            .withColumn("pairs", F.col("s") * (F.col("s") - 1) / 2)
        )
        stats = sizes.agg(
            F.count("*").alias("n_buckets"),
            F.sum("s").alias("rows"),
            F.max("s").alias("max_s"),
            F.expr("percentile_approx(s, 0.5)").alias("med_s"),
            F.expr("percentile_approx(s, 0.99)").alias("p99_s"),
            F.sum("pairs").alias("total_pairs"),
            F.max("pairs").alias("max_pairs"),
        ).first()
        top = (
            sizes.orderBy(F.desc("pairs")).limit(10).collect()
        )
        n_vec = emb.count()
        rec = {
            "n_vectors": n_vec,
            "n_buckets": stats["n_buckets"],
            "banded_rows": stats["rows"],
            "bucket_size_max": stats["max_s"],
            "bucket_size_median": stats["med_s"],
            "bucket_size_p99": stats["p99_s"],
            "max_over_median": round(stats["max_s"] / max(stats["med_s"], 1), 2),
            "total_candidate_pairs": int(stats["total_pairs"]),
            "max_bucket_pairs": int(stats["max_pairs"]),
            "max_bucket_pair_share": round(stats["max_pairs"] / max(stats["total_pairs"], 1), 4),
            "top10_buckets": [
                {"band": r["band"], "chunk": r["chunk"], "size": r["s"], "pairs": int(r["pairs"])}
                for r in top
            ],
        }
        out[sf_dir] = rec
        print(sf_dir, json.dumps(rec, indent=2))
    with open(os.path.join(REPO, "SKEW_EMBED_R15.json"), "w") as fh:
        json.dump(out, fh, indent=2)
    print("wrote SKEW_EMBED_R15.json")


if __name__ == "__main__":
    main()
