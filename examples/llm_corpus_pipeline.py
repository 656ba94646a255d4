"""Runnable end-to-end demo: an LLM training-corpus curation pipeline.

Composes the engine's first-class operators into the standard
pretraining-data funnel — the workload this engine is designed to run
at 100 TB:

    documents
      → quality filter          (q_text_quality: Gopher-style rules)
      → exact dedup             (q_dedup_exact: content-hash keep-min)
      → near-dup dedup          (q_dedup_near: MinHash-LSH pairs,
                                 drop the larger id of each pair)
      → mixture report          (q_mixture_temperature: √p shares)
      → sequence packing        (token-budget packing for training)
      → parquet sink

Every stage is the SAME code path the registry attests (the builders
from functions/text.py, functions/dedup.py, functions/pipeline_ops.py
— not demo re-implementations), joined on doc_id so each stage only
sees the previous stage's survivors. The packing stage re-runs the
q_pack_sequences window formula on the filtered survivor set.

Usage (from the repo root)::

    python examples/llm_corpus_pipeline.py [sf_dir] [out_dir]

Defaults: sf_dir=/root/testdata/sf0.001, out_dir=a temp dir. Prints
the stage-by-stage funnel, the per-source mixture shares, and a packed
sample, then exits.
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from streamclient_spark.functions.dedup import (  # noqa: E402
    q_dedup_exact,
    q_dedup_near,
)
from streamclient_spark.functions.pipeline_ops import (  # noqa: E402
    q_mixture_temperature,
)
from streamclient_spark.functions.text import q_text_quality  # noqa: E402
from streamclient_spark.session import get_spark  # noqa: E402
from streamclient_spark.tables import load  # noqa: E402

PACK_BUDGET = 512  # tokens per packed training sequence


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp(
        prefix="llm_corpus_"
    )
    spark = get_spark("llm-corpus-pipeline")

    docs = load(spark, sf_dir, "documents")
    funnel = [("raw documents", docs.count())]

    # 1. quality filter — the attested Gopher-rules verdict
    quality = q_text_quality(spark, sf_dir)
    kept_q = quality.filter(F.col("verdict") == "keep").select("doc_id")
    funnel.append(("after quality filter", kept_q.count()))

    # 2. exact dedup — survivors are each content group's minimum id
    exact_keep = q_dedup_exact(spark, sf_dir).select(
        F.col("keep_doc_id").alias("doc_id")
    )
    kept_e = kept_q.join(exact_keep, "doc_id", "left_semi")
    funnel.append(("after exact dedup", kept_e.count()))

    # 3. near-dup dedup — LSH pairs; drop the larger id of each pair
    near_drop = q_dedup_near(spark, sf_dir).select(
        F.greatest("a_id", "b_id").alias("doc_id")
    ).distinct()
    kept_n = kept_e.join(near_drop, "doc_id", "left_anti")
    funnel.append(("after near-dup dedup", kept_n.count()))

    survivors = docs.join(kept_n, "doc_id", "left_semi")

    # 4. mixture shares — temperature-reweighted per-source sampling plan
    mixture = q_mixture_temperature(spark, sf_dir)

    # 5. pack survivors into fixed token-budget training sequences
    #    (the q_pack_sequences window formula, on the survivor set)
    toks = F.size(
        F.filter(F.split("text", r"\s+"), lambda t: t != F.lit(""))
    )
    w = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    packed = survivors.select(
        "doc_id", "lang", "source", "text", toks.alias("n_tokens")
    ).withColumn(
        "seq_id",
        F.expr(
            f"(sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id "
            f"ROWS UNBOUNDED PRECEDING) - n_tokens) div {PACK_BUDGET}"
        ),
    )
    packed.write.mode("overwrite").parquet(os.path.join(out_dir, "packed"))

    print("== curation funnel ==")
    for stage, n in funnel:
        print(f"  {stage:24s} {n:8d}")
    print("== mixture shares (temperature-reweighted) ==")
    for r in mixture.orderBy("source").collect():
        print(f"  {r['source']:12s} n_docs={r['n_docs']:6d} "
              f"budget_docs={r['budget_docs']}")
    n_seq = packed.select("lang", "seq_id").distinct().count()
    print(f"== packed {packed.count()} docs into {n_seq} sequences of "
          f"≤{PACK_BUDGET} tokens → {out_dir}/packed ==")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
