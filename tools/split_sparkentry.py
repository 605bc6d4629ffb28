#!/usr/bin/env python3
"""One-shot refactor: split SparkEntry.scala into per-module registries.

Moves the 194 queries/oracleSql entry pairs into family registry objects
under graft.registry (entry bodies byte-identical), shared fixtures + SQL
helper builders into graft.registry.Shared, and leaves SparkEntry as a thin
aggregator keeping the driver contract. Asserts the partition covers all
keys exactly once and the regenerated key sets match the original.
"""
import re, sys, os

SRC = 'src/main/scala/graft/SparkEntry.scala'
OUT = 'src/main/scala/graft/registry'
lines = open(SRC).read().split('\n')

ENT = re.compile(r'^    "([a-z0-9_]+)" ->')

def find(pred, start=0):
    for i in range(start, len(lines)):
        if pred(lines[i]):
            return i
    raise SystemExit('not found from %d' % start)

imports = lines[2:12]
assert all(l.startswith('import ') for l in imports), imports
objdoc = lines[13:20]

q_def = find(lambda l: l.startswith('  def queries'))
q_close = find(lambda l: l == '  )', q_def)
o_def = find(lambda l: l.startswith('  def oracleSql'))
o_close = find(lambda l: l == '  )', o_def)
entry_doc = find(lambda l: l.startswith('  /** Flagship query'))
entry_end = find(lambda l: l == '  }', entry_doc)
q_doc = find(lambda l: l.startswith('  /** One entry per implemented'))
o_doc = find(lambda l: l.startswith('  /** For each key in queries'))

shared_a = lines[21:entry_doc]            # fixtures + builders + caches
entry_block = lines[entry_doc:entry_end + 1]
fixtures2 = lines[q_close + 1:o_doc]      # suggestQ / heapsThresholds / costQ
shared_b = lines[o_close + 1:len(lines) - 2]  # trailing SQL helper builders
assert lines[len(lines) - 2] == '}' and lines[len(lines) - 1] == ''

def parse_entries(lo, hi):
    """[(key, prelude_lines, body_lines)] for Map entries in lines[lo:hi]."""
    starts = [i for i in range(lo, hi) if ENT.match(lines[i])]
    out = []
    prelude = lines[lo:starts[0]]
    for n, st in enumerate(starts):
        end = starts[n + 1] if n + 1 < len(starts) else hi
        body = lines[st:end]
        # trailing blank/comment lines belong to the NEXT entry
        nxt = []
        while body and (not body[-1].strip() or body[-1].lstrip().startswith('//')):
            nxt.insert(0, body.pop())
        # strip the inter-entry comma from the last body line
        if body[-1].rstrip().endswith(','):
            body[-1] = body[-1].rstrip()[:-1]
        out.append((ENT.match(lines[st]).group(1), prelude, body))
        prelude = nxt
    return out

q_entries = parse_entries(q_def + 1, q_close)
o_entries = parse_entries(o_def + 1, o_close)
qkeys = [k for k, _, _ in q_entries]
okeys = [k for k, _, _ in o_entries]
assert len(qkeys) == len(set(qkeys)) == 194, len(qkeys)
assert set(qkeys) == set(okeys)

GROUPS = {
 'CoreIndexRegistry': ('corpus scan, postings/stats construction, index layout & serving-infrastructure studies', [
  'ft_corpus','ft_postings','ft_term_stats','ft_term_stats_repo','ft_shard_select','ft_doc_stats',
  'ft_stats_rollup','ft_rollup_facets','ft_query_cost','ft_explain','ft_valid_paths','ft_year_filter',
  'ft_http_filter','ft_html_extract','ft_compressed_postings','ft_postings_lex','ft_postings_ru',
  'ft_dict_frontcode','ft_docid_remap','ft_skip_study','ft_codec_study','ft_rice_study','ft_static_prune',
  'ft_merge_policy','ft_partition_study','ft_shard_route','ft_shard_load','ft_ring_balance','ft_bloom_dict',
  'ft_cache_postings','ft_cache_static','ft_cms_cf']),
 'RankingRegistry': ('BM25/LM/DFR/VSM top-k, WAND/MaxScore/TAAT pruning, champions/tiered/impact serving, flagship search', [
  'ft_intersect','ft_sumtf_topk','ft_bm25_topk','ft_lm_topk','ft_pl2_topk','ft_impact_topk','ft_bm25_mm',
  'ft_vsm_topk','ft_bm25_page2','ft_search_after','ft_boolean','ft_missing_terms','ft_prune_common',
  'ft_wand_topk','ft_bm25_or_topk','ft_synonym','ft_wand_or_topk','ft_maxscore_topk','ft_wand_persisted',
  'ft_taat_quit','ft_fagin_ta','ft_recency_topk','ft_group_topk','ft_collapse_repo','ft_bm25f','ft_blend',
  'ft_champions','ft_champions_persisted','ft_tiered','ft_percolate','ft_search_flagship','ft_search_lex',
  'ft_batch_bm25','ft_cascade']),
 'PhraseSuggestRegistry': ('positional/phrase/proximity retrieval, passages, prefix/fuzzy/wildcard, suggesters, snippets, facets', [
  'ft_positions','ft_phrase','ft_phrase_coded','ft_biword','ft_proximity','ft_near','ft_phrase_boost',
  'ft_sdm_topk','ft_maxp_topk','ft_maxp_snippet','ft_prefix','ft_autocomplete','ft_fuzzy','ft_wildcard',
  'ft_wildcard_persisted','ft_more_like','ft_query_segment','ft_suggest','ft_suggest_context','ft_snippet',
  'ft_snippet_multi','ft_facets','ft_facets_persisted','ft_related']),
 'GraphCrawlRegistry': ('crawl frontier/recrawl, link-graph ranks (PageRank/TrustRank/HITS/SALSA/OPIC), anchors, politeness', [
  'ft_crawl_frontier','ft_recrawl_delta','ft_recrawl_rate','ft_pagerank','ft_trustrank','ft_crawl_priority',
  'ft_opic','ft_salsa','ft_robots_filter','ft_cocitation','ft_coupling','ft_hits','ft_anchor_postings',
  'ft_anchor_search','ft_crawl_polite']),
 'EvalRegistry': ('IR evaluation (nDCG/MAP/RBP/ERR, bootstrap, interleaving, NQC), fusion, diversification, PRF, LTR', [
  'ft_eval_metrics','ft_eval_rbp','ft_eval_bootstrap','ft_interleave','ft_qpp_nqc','ft_query_gini',
  'hybrid_rrf','hybrid_combmnz','ft_mmr','ft_xquad','ft_prf','ltr_features','ltr_hard_negatives']),
 'DedupRegistry': ('exact/near dedup: MinHash-LSH, SimHash, APSS, winnowing, clusters/canonical, substring removal, contamination', [
  k for k in qkeys if k.startswith('dedup_')]),
 'AnnRegistry': ('embedding ANN: brute/LSH/IVF, SQ8/PQ quantization, recall gates', [
  k for k in qkeys if k.startswith('ann_')]),
 'TextRegistry': ('text analysis: lang-id, quality, tokens, BPE, fingerprints, keywords, readability, sketch fits', [
  k for k in qkeys if k.startswith('text_')]),
 'PipelineRegistry': ('training-data pipeline: splits, packing, curation, classifiers, multimodal plumbing', [
  k for k in qkeys if k.startswith(('split_', 'pipeline_', 'mm_'))]),
 'EventsRegistry': ('event analytics: windows, sessions, funnels, retention, as-of, bursts, KMV actives, anomalies', [
  k for k in qkeys if k.startswith('events_')]),
}
assigned = [k for _, (_, ks) in GROUPS.items() for k in ks]
assert len(assigned) == len(set(assigned)) == 194, (len(assigned), len(set(assigned)))
assert set(assigned) == set(qkeys)

qmap = {k: (p, b) for k, p, b in q_entries}
omap = {k: (p, b) for k, p, b in o_entries}

HEAD = 'package graft.registry\n\n' + '\n'.join(imports) + '\nimport graft.registry.Shared._\n'

def emit_map(name, typ, keys, table):
    chunks = []
    for k in keys:
        prelude, body = table[k]
        txt = '\n'.join([l for l in prelude if l.strip()] + body)
        chunks.append(txt)
    return '  val %s: %s = Map(\n%s\n  )\n' % (name, typ, ',\n'.join(chunks))

os.makedirs(OUT, exist_ok=True)

# ---- trait ----
open(os.path.join(OUT, 'QueryRegistry.scala'), 'w').write('''package graft.registry

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A per-module slice of the driver contract: harness queries plus their
  * DuckDB oracle twins, aggregated by [[graft.SparkEntry]]. Key sets of
  * `queries` and `oracleSql` are identical within each registry
  * (RegistrySpec pins it, along with cross-registry disjointness). */
private[graft] trait QueryRegistry {
  def queries: Map[String, (SparkSession, String) => DataFrame]
  def oracleSql: Map[String, String]
}
''')

# ---- Shared ----
def deprivatize(ls):
    return [re.sub(r'^  private (def|val|lazy val) ', r'  \1 ', l) for l in ls]

shared = ['package graft.registry', ''] + imports + ['',
 '/** Fixtures, cached index builders, and DuckDB SQL building blocks shared',
 '  * by every [[QueryRegistry]] (split out of SparkEntry; entry bodies are',
 '  * unchanged). Members are package-visible via the object being',
 '  * `private[graft]` rather than per-member modifiers. */',
 'private[graft] object Shared {'] \
 + deprivatize(shared_a) + deprivatize(fixtures2) + deprivatize(shared_b) + ['}', '']
open(os.path.join(OUT, 'Shared.scala'), 'w').write('\n'.join(shared))

# ---- family registries ----
for gname, (gdoc, keys) in GROUPS.items():
    body = HEAD + '\n/** %s. */\nprivate[graft] object %s extends QueryRegistry {\n' % (gdoc, gname)
    body += emit_map('queries', 'Map[String, (SparkSession, String) => DataFrame]', keys, qmap)
    body += '\n'
    body += emit_map('oracleSql', 'Map[String, String]', keys, omap)
    body += '}\n'
    open(os.path.join(OUT, gname + '.scala'), 'w').write(body)

# ---- new SparkEntry ----
fwd = '''package graft

import graft.index.{InvertedIndex, ShardPosting}
import graft.query.Search
import graft.registry._
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

''' + '\n'.join(objdoc) + '''
object SparkEntry {

  // ---- shared fixed fixtures (definitions live in registry.Shared) ----
  def q2: Seq[String] = Shared.q2
  def q3: Seq[String] = Shared.q3
  def qMissingInput: String = Shared.qMissingInput
  def qSeg: Seq[String] = Shared.qSeg
  def qLexInput: String = Shared.qLexInput
  def qLexTerms: Seq[String] = Shared.qLexTerms
  def synGroups: Seq[(String, Seq[String])] = Shared.synGroups
  def cmsTerms: Seq[String] = Shared.cmsTerms
  def mixTargets: Map[String, Int] = Shared.mixTargets
  def seedTopics: Map[String, Seq[String]] = Shared.seedTopics
  def batchQ: Seq[(Long, String)] = Shared.batchQ
  def suggestQ: Seq[String] = Shared.suggestQ
  def heapsThresholds: Seq[Long] = Shared.heapsThresholds
  def costQ: Seq[(Long, String)] = Shared.costQ

  // ---- cached per-sfDir builders (definitions live in registry.Shared) --
  def index(spark: SparkSession, sfDir: String): (DataFrame, InvertedIndex.Tables) =
    Shared.index(spark, sfDir)
  def shards(spark: SparkSession, sfDir: String): Dataset[ShardPosting] =
    Shared.shards(spark, sfDir)
  def persistedIndex(spark: SparkSession, sfDir: String): String =
    Shared.persistedIndex(spark, sfDir)
  def persistedAux(s: SparkSession, dir: String): String =
    Shared.persistedAux(s, dir)
  def bm25fEff(s: SparkSession, dir: String): DataFrame = Shared.bm25fEff(s, dir)
  def anchorEff(s: SparkSession, dir: String): DataFrame = Shared.anchorEff(s, dir)
  def lexIndex(s: SparkSession, dir: String): InvertedIndex.Tables =
    Shared.lexIndex(s, dir)
  def mltIndex(s: SparkSession, dir: String): (DataFrame, DataFrame) =
    Shared.mltIndex(s, dir)

''' + '\n'.join(entry_block) + '''

  /** The per-module registries (queries + oracle twins live beside their
    * operators under graft.registry; this object stays the driver contract). */
  val registries: Seq[QueryRegistry] = Seq(
    CoreIndexRegistry, RankingRegistry, PhraseSuggestRegistry,
    GraphCrawlRegistry, EvalRegistry, DedupRegistry, AnnRegistry,
    TextRegistry, PipelineRegistry, EventsRegistry)

  /** One entry per implemented operator from SURVEY.md §2. */
  lazy val queries: Map[String, (SparkSession, String) => DataFrame] =
    registries.iterator.map(_.queries).reduce(_ ++ _)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  lazy val oracleSql: Map[String, String] =
    registries.iterator.map(_.oracleSql).reduce(_ ++ _)
}
'''
open(SRC, 'w').write(fwd)
print('wrote', len(GROUPS) + 2, 'registry files; SparkEntry now', len(fwd.split(chr(10))), 'lines')
