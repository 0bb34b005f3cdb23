#!/usr/bin/env python3
"""One-shot refactor: split SparkEntry.scala into per-family registry
objects under graft.registry (VERDICT r10 task 5). Zero semantic change:
every query entry, oracle string, and helper moves verbatim; SparkEntry
becomes the concatenation of the family maps."""
import re, sys

SRC = "src/main/scala/graft/SparkEntry.scala"
lines = open(SRC).read().split("\n")  # 0-indexed; file lines are i+1


def fam_of(name):
    if name == "view_kmeans_det" or name.startswith("sim_"):
        return "sim"
    if name.startswith("dedup_"):
        return "dedup"
    if name.startswith("text_") or name.startswith("search_"):
        return "text"
    if name.startswith("domain_") or name.startswith("view_"):
        return "domain"
    if re.match(r"^(sample_|pipeline_|lake_|dq_|stream_|mm_|s[1-4]_)", name) \
            or name == "f_zorder":
        return "pipe"
    return "rel"


ANCHOR = re.compile(r'^    "([a-z0-9_]+)" ->')


def entries(first, last):
    """[(name, start, end)] 1-indexed inclusive, comments attached to
    the following entry."""
    anchors = [(i + 1, ANCHOR.match(lines[i]).group(1))
               for i in range(first - 1, last)
               if ANCHOR.match(lines[i])]
    out = []
    starts = []
    for ln, name in anchors:
        s = ln
        while s - 1 >= first and lines[s - 2].strip().startswith("//"):
            s -= 1
        starts.append((s, name))
    for i, (s, name) in enumerate(starts):
        e = starts[i + 1][0] - 1 if i + 1 < len(starts) else last
        out.append((name, s, e))
    return out


def chunk(s, e):
    return "\n".join(lines[s - 1:e]).rstrip()


# --- queries map: entries between lines 23 and 277 (map closes at 278)
q_entries = entries(23, 277)
# --- oracleSql map: entries between 1155 and 3485 (closes at 3486)
o_entries = entries(1155, 3485)

q_names = {n for n, _, _ in q_entries}
o_names = {n for n, _, _ in o_entries}
print("queries:", len(q_entries), "oracles:", len(o_entries),
      "oracle-only:", sorted(o_names - q_names),
      "query-only count:", len(q_names - o_names))

# --- helper blocks: (anchor_line, family); end = next anchor's
# comment-adjusted start - 1; last helper ends at 1139 (simOracle `}`)
helpers = [
    (280, "shared"), (283, "shared"), (287, "text"), (319, "shared"),
    (324, "dedup"), (337, "dedup"), (369, "dedup"), (395, "text"),
    (412, "domain"), (423, "domain"), (454, "domain"), (492, "domain"),
    (525, "domain"), (540, "domain"), (577, "dedup"), (604, "dedup"),
    (612, "dedup"), (647, "sim"), (662, "sim"), (664, "sim"),
    (675, "sim"), (721, "sim"), (726, "sim"), (730, "sim"), (743, "sim"),
    (767, "sim"), (775, "sim"), (782, "sim"), (808, "sim"), (819, "sim"),
    (827, "sim"), (852, "sim"), (863, "sim"), (892, "sim"), (936, "sim"),
    (946, "sim"), (970, "sim"), (991, "sim"), (996, "sim"), (1020, "sim"),
    (1053, "dedup"), (1089, "dedup"), (1102, "dedup"), (1123, "sim"),
]
hstarts = []
for ln, fam in helpers:
    s = ln
    while lines[s - 2].strip().startswith(("//", "/**", "*")):
        s -= 1
    hstarts.append((s, fam))
hblocks = []
for i, (s, fam) in enumerate(hstarts):
    e = hstarts[i + 1][0] - 1 if i + 1 < len(hstarts) else 1139
    hblocks.append((fam, chunk(s, e)))

FAMS = {
    "rel": ("RelationalReg",
            "Relational/TPC-H-ish slice of the driver contract: scans,"
            " joins, aggregates, windows, set ops, sketches, skew,"
            " time-series, and graph queries with their DuckDB oracles."),
    "domain": ("DomainReg",
               "Domain-pipeline slice of the driver contract: the ten"
               " reference domains' enrich rollups and ES-shaped views."),
    "dedup": ("DedupReg",
              "Deduplication slice of the driver contract: exact, MinHash"
              "-LSH, SimHash, n-gram, SRP, embedding-cosine, semantic,"
              " substring, and clustering dedup with DuckDB oracles."),
    "text": ("TextReg",
             "Text-analysis/search slice of the driver contract: quality,"
             " langid, BM25/FTS, phrase/bool search, TF-IDF, chunking,"
             " contamination, and hybrid retrieval with DuckDB oracles."),
    "sim": ("SimReg",
            "Similarity/vector slice of the driver contract: brute-force"
            " cosine, IVF (label, trained, √N, sampled), SQ8, PQ,"
            " recall measurements, and index lifecycles with oracles."),
    "pipe": ("PipelineReg",
             "Pipeline slice of the driver contract: sampling, packing,"
             " lake ops, data-quality, streaming, multimodal, and format"
             " round-trips with their DuckDB oracles."),
}

HEADER = """package graft.registry

import org.apache.spark.sql.{{DataFrame, SparkSession}}
import org.apache.spark.sql.functions.{{col, expr, lit, max}}
import graft.operators._
import graft.registry.RegShared._

/** {doc}
  *
  * Split out of SparkEntry (r11): entries and oracle SQL move verbatim;
  * SparkEntry concatenates the family maps. Column names stay identical
  * between `queries` and `oracleSql` (the driver sorts columns by name
  * before hashing).
  */
object {obj} {{
"""

for fam, (obj, doc) in FAMS.items():
    parts = [HEADER.format(obj=obj, doc=doc)]
    parts.append("  private[graft] val queries"
                 ": Map[String, (SparkSession, String) => DataFrame] = Map(")
    for name, s, e in q_entries:
        if fam_of(name) == fam:
            parts.append(chunk(s, e).rstrip(",") + ",")
    parts.append("  )\n")
    for hfam, blk in hblocks:
        if hfam == fam:
            parts.append(blk.replace("private val", "private[graft] val")
                            .replace("private def", "private[graft] def")
                         + "\n")
    parts.append("  private[graft] val oracleSql: Map[String, String] = Map(")
    for name, s, e in o_entries:
        if fam_of(name) == fam:
            parts.append(chunk(s, e).rstrip(",") + ",")
    parts.append("  )\n}")
    path = f"src/main/scala/graft/registry/{obj}.scala"
    open(path, "w").write("\n".join(parts) + "\n")
    print("wrote", path)

# shared helpers object
shared = [b for f, b in hblocks if f == "shared"]
open("src/main/scala/graft/registry/RegShared.scala", "w").write(
    """package graft.registry

/** Oracle-SQL helpers shared across the family registries: the portable
  * salted hash and the document normalizer / split-bucket SQL twins that
  * several families' oracles embed (derived from the same constants as
  * the engine, so the oracle can never drift).
  */
object RegShared {
"""
    + "\n\n".join(b.replace("private val", "private[graft] val")
                   .replace("private def", "private[graft] def")
                  for b in shared)
    + "\n}\n")
print("wrote RegShared.scala")

# new slim SparkEntry: keep lines 1-21 (header + entry), swap in the
# concatenation, keep the oracleSql doc comment (1142-1153)
doc_comment = "\n".join(lines[1141:1153])
slim = "\n".join(lines[0:20]) + """
  /** One entry per implemented operator from SURVEY.md §2 — the
    * concatenation of the per-family registries (graft.registry). */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.registry.RelationalReg.queries ++
    graft.registry.DomainReg.queries ++
    graft.registry.DedupReg.queries ++
    graft.registry.TextReg.queries ++
    graft.registry.SimReg.queries ++
    graft.registry.PipelineReg.queries

""" + doc_comment + """
  def oracleSql: Map[String, String] =
    graft.registry.RelationalReg.oracleSql ++
    graft.registry.DomainReg.oracleSql ++
    graft.registry.DedupReg.oracleSql ++
    graft.registry.TextReg.oracleSql ++
    graft.registry.SimReg.oracleSql ++
    graft.registry.PipelineReg.oracleSql
}
"""
open(SRC, "w").write(slim)
print("rewrote SparkEntry.scala")
