"""Parquet-dataset export in the Hugging Face ``datasets`` repo layout:

    out_dir/
      data/{split}-00000-of-00008.parquet   deterministic shard names
      dataset_info.json                     features + per-split stats

so the shards load directly with
``load_dataset("parquet", data_files="out_dir/data/train-*.parquet")``
(or via the hub's auto-parquet loader when pushed as-is) — the handoff
format most training stacks consume after curation.

Scale shape: one repartition(n_shards, shard) shuffle; each executor
writes its shard files with pyarrow (rows sorted by the shard-hash key
for byte determinism) and reports (shard, rows, bytes); only the tiny
``dataset_info.json`` touches the driver. Shard count is the file-size
knob — target 256 MB-1 GB per shard at scale.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, functions as F
import pyspark.sql.types as T

from rag_content_spark.functions.hashing import stable_hash64


def _feature_of(dt: T.DataType) -> dict:
    """datasets-style feature descriptor for a Spark type (the common
    subset; nested structs recurse)."""
    if isinstance(dt, T.StringType):
        return {"dtype": "string", "_type": "Value"}
    if isinstance(dt, (T.LongType, T.IntegerType)):
        return {"dtype": "int64", "_type": "Value"}
    if isinstance(dt, (T.DoubleType,)):
        return {"dtype": "float64", "_type": "Value"}
    if isinstance(dt, T.FloatType):
        return {"dtype": "float32", "_type": "Value"}
    if isinstance(dt, T.BooleanType):
        return {"dtype": "bool", "_type": "Value"}
    if isinstance(dt, T.BinaryType):
        return {"dtype": "binary", "_type": "Value"}
    if isinstance(dt, T.ArrayType):
        return {"feature": _feature_of(dt.elementType), "_type": "Sequence"}
    if isinstance(dt, T.StructType):
        return {f.name: _feature_of(f.dataType) for f in dt.fields}
    return {"dtype": "string", "_type": "Value"}  # fallback: stringified


def write_hf_parquet_dataset(
    df: DataFrame,
    out_dir: str,
    split: str = "train",
    key_col: str | None = None,
    n_shards: int = 8,
) -> DataFrame:
    """Write ``df`` as an HF-layout parquet dataset split; returns the
    manifest DataFrame (shard, n_rows, n_bytes). ``key_col`` drives the
    shard hash and the within-shard sort (byte determinism); defaults
    to the first column."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pyspark.sql.pandas.types import to_arrow_schema

    key = key_col or df.columns[0]
    data_dir = os.path.join(out_dir, "data")
    os.makedirs(data_dir, exist_ok=True)
    # ONE arrow schema for every shard — populated shards written via
    # from_pandas would otherwise carry pandas-inferred types
    # (timestamp[ns], nullable-int→float64) that differ from the empty
    # backfill shards' to_arrow_schema types, and strict loaders reject
    # a split with inconsistent parquet schemas (round-7 ADVICE)
    aschema = to_arrow_schema(df.select(*df.columns).schema)
    flat = df.withColumn(
        "_shard",
        (stable_hash64(F.col(key).cast("string"), salt="hf") % n_shards).cast(
            "int"
        ),
    ).repartition(n_shards, "_shard")
    cols = df.columns

    def _write(batches):
        per_shard: dict[int, list] = {}
        for pdf in batches:
            for shard, grp in pdf.groupby("_shard"):
                per_shard.setdefault(int(shard), []).append(grp)
        out = []
        for shard, grps in per_shard.items():
            pdf = pd.concat(grps).sort_values(key, kind="mergesort")
            name = f"{split}-{shard:05d}-of-{n_shards:05d}.parquet"
            path = os.path.join(data_dir, name)
            pq.write_table(
                pa.Table.from_pandas(
                    pdf[cols], schema=aschema, preserve_index=False
                ),
                path,
            )
            out.append((shard, len(pdf), os.path.getsize(path)))
        yield pd.DataFrame(out, columns=["shard", "n_rows", "n_bytes"])

    manifest = flat.mapInPandas(
        _write, schema="shard int, n_rows long, n_bytes long"
    ).localCheckpoint(eager=True)

    # hash sharding can leave a shard empty (no executor writes its
    # file) — loaders that enumerate by the -of-NNNNN count would see
    # missing files, so backfill empty-but-valid parquet shards with the
    # exact arrow schema and fold them into the manifest
    written = {int(r["shard"]) for r in manifest.select("shard").collect()}
    missing = [s for s in range(n_shards) if s not in written]
    if missing:
        extra = []
        for shard in missing:
            name = f"{split}-{shard:05d}-of-{n_shards:05d}.parquet"
            path = os.path.join(data_dir, name)
            pq.write_table(aschema.empty_table(), path)
            extra.append((shard, 0, os.path.getsize(path)))
        manifest = manifest.union(
            df.sparkSession.createDataFrame(
                extra, "shard int, n_rows long, n_bytes long"
            )
        ).localCheckpoint(eager=True)

    stats = manifest.agg(
        F.coalesce(F.sum("n_rows"), F.lit(0)).alias("rows"),
        F.coalesce(F.sum("n_bytes"), F.lit(0)).alias("bytes"),
    ).collect()[0]
    info = {
        "features": {
            f.name: _feature_of(f.dataType) for f in df.schema.fields
        },
        "splits": {
            split: {
                "name": split,
                "num_examples": int(stats["rows"]),
                "num_bytes": int(stats["bytes"]),
                "shards": n_shards,
            }
        },
    }
    info_path = os.path.join(out_dir, "dataset_info.json")
    merged = info
    if os.path.exists(info_path):
        # multi-split export: merge split entries, keep first features
        with open(info_path) as f:
            prior = json.load(f)
        prior["splits"].update(info["splits"])
        merged = prior
    with open(info_path, "w") as f:
        json.dump(merged, f, indent=2, sort_keys=True)
    return manifest
