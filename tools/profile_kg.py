"""Per-stage wall profiling of the KG pipeline over the materialized
scaled transcript table — the feedback loop for optimizing the hot path."""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench
from information_extraction_from_biographies_spark.operators import (
    canonicalize,
    cooccurrence,
    mentions,
    normalize,
    scan,
    triples,
)
from information_extraction_from_biographies_spark.session import get_spark


def step(label, fn):
    t0 = time.monotonic()
    out = fn()
    print(f"{label:32s} {time.monotonic() - t0:7.2f}s")
    return out


def main():
    n_convs = int(sys.argv[1]) if len(sys.argv) > 1 else 4000
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 0
    spark = get_spark(
        app_name="kg-profile", master=f"local[{cores}]", shuffle_partitions=2 * cores
    )
    path = step("materialize input", lambda: bench.materialize_transcripts(spark, n_convs, career_reps=reps))
    tdf = spark.read.parquet(path)

    turns, meta = normalize.normalize(tdf)
    turns = turns.persist()
    meta = meta.persist()
    step("stage0 normalize (count)", lambda: (turns.count(), meta.count()))

    conv_names, conv_aliases = mentions.extract_people(turns, meta)
    conv_names = conv_names.persist()
    conv_aliases = conv_aliases.persist()
    step("stage1 extract_people", lambda: (conv_names.count(), conv_aliases.count()))

    people, aliases = mentions.build_registry(conv_names, conv_aliases)
    people = people.persist()
    aliases = aliases.persist()
    step("stage1 registry", lambda: (people.count(), aliases.count()))

    index = step(
        "surface index (driver)",
        lambda: scan.build_surface_index(mentions.registry_surfaces(people, aliases)),
    )
    print(f"  surfaces: {len(index.rows)}")

    kin = triples.kinship_triples(conv_aliases)
    step("stage2 kinship triples", kin.count)
    mention_rows = scan.scan_mentions(turns, index).persist()
    step("stage2 mention scan", mention_rows.count)
    ps_df = triples.conv_person_surfaces(
        scan.persons_in_conv(mention_rows), mentions.registry_surfaces(people, aliases)
    )
    vb = triples.verb_triples(turns, meta, ps_df)
    step("stage2 verb triples", vb.count)
    hm = triples.hometown_triples(turns, meta)
    step("stage2 hometown triples", hm.count)
    vt = triples.vital_triples(meta)
    step("stage2 vital triples", vt.count)
    tl = triples.timeline_table(turns)
    step("stage2 timeline", tl.count)

    cooc = cooccurrence.cooccurrence_scores(
        scan.occurrences(mention_rows), scan.persons_in_conv(mention_rows), meta
    )
    step("stage4 cooccurrence", cooc.count)

    ents = canonicalize.entity_table(people, aliases)
    step("stage3 entities (CC)", ents.count)
    spark.stop()


if __name__ == "__main__":
    main()
