package graft.data

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * HTML → text extraction and boilerplate stripping — the front door of a
 * crawl-corpus pipeline (the step trafilatura/jusText play in published
 * pipelines), Spark-first: the whole extractor is a chain of CODEGEN'D
 * `regexp_replace`/`regexp_extract_all` Column expressions (compiled
 * patterns, whole-stage codegen, map-only — no UDF, no shuffle), and the
 * boilerplate POLICY (link-density + length gates, jusText's core idea)
 * is ordinary relational filtering over an exploded block frame — so
 * Catalyst sees through all of it, and a DuckDB oracle reproduces every
 * value exactly (same RE2-class regex chain, same integer ppm math).
 *
 * Scope contract (documented, spec-pinned): tag-soup HTML of the common
 * shapes — nested block/inline tags, attributes, script/style/comment
 * islands, the high-frequency named entities (`&lt; &gt; &quot; &apos;
 * &nbsp; &amp;`) plus the numeric apostrophe `&#39;` — other numeric
 * `&#NNN;` escapes pass through as literal text (a char-code decode
 * needs a per-match lambda no codegen'd regex chain has). NOT a
 * browser-grade parser: CDATA, conditional comments, and broken
 * `<script>` nesting degrade gracefully (text may keep fragments) rather
 * than erroring — the 100 TB posture, where one malformed page must
 * never kill a partition.
 */
object Html {

  /** Tags that terminate a text block (block-level or structural). */
  private val BlockTags =
    "p|div|br|li|ul|ol|h1|h2|h3|h4|h5|h6|tr|td|th|table|thead|tbody|" +
      "article|section|header|footer|nav|blockquote|pre|form|hr|title"

  /** Drop script/style/comment islands — content is never text. `(?is)`:
   * case-insensitive, dot-matches-newline; non-greedy bodies. */
  def stripIslands(html: Column): Column = {
    val noComments = regexp_replace(html, "(?s)<!--.*?-->", "")
    val noScript =
      regexp_replace(noComments, "(?is)<script\\b.*?</script\\s*>", "")
    regexp_replace(noScript, "(?is)<style\\b.*?</style\\s*>", "")
  }

  /** Decode the high-frequency named entities + the numeric apostrophe
   * (`&#39;`, the one numeric escape common in real pages). General
   * `&#NNN;` escapes are OUT of scope (documented above) — they pass
   * through undecoded rather than pulling a UDF into the hot path.
   * Applied AFTER tag stripping so a decoded `&lt;` can never re-form a
   * tag. */
  def decodeEntities(c: Column): Column = {
    val named = Seq(
      "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"", "&#39;" -> "'",
      "&apos;" -> "'", "&nbsp;" -> " ")
    val decoded = named.foldLeft(c) { case (acc, (e, v)) =>
      regexp_replace(acc, e, java.util.regex.Matcher.quoteReplacement(v))
    }
    // &amp; LAST — else "&amp;lt;" would double-decode to "<"
    regexp_replace(decoded, "&amp;", "&")
  }

  /** Full extractor: islands out, block tags → newline, all other tags
   * out, entities decoded, whitespace normalized (runs of spaces/tabs →
   * one space, trimmed lines, empty lines dropped). */
  def htmlToText(html: Column): Column = {
    val blocks = regexp_replace(stripIslands(html),
      s"(?i)</?(?:$BlockTags)\\b[^>]*>", "\n")
    val noTags = regexp_replace(blocks, "(?s)<[^>]*>", "")
    val decoded = decodeEntities(noTags)
    val spaced = regexp_replace(decoded, "[ \\t\\r]+", " ")
    val trimmed = regexp_replace(spaced, "(?m)^ +| +$", "")
    trim(regexp_replace(trimmed, "\\n{2,}", "\n"), "\n")
  }

  /** Characters of anchor text (`<a …>…</a>` contents, tags stripped,
   * entities decoded) — the numerator of link density. */
  def anchorChars(html: Column): Column =
    coalesce(length(decodeEntities(regexp_replace(concat_ws("",
      regexp_extract_all(stripIslands(html),
        lit("(?is)<a\\b[^>]*>(.*?)</a\\s*>"), lit(1))),
      "(?s)<[^>]*>", ""))).cast("long"), lit(0L))

  /**
   * Main-content extraction: keep blocks with ≥ `minChars` of text and
   * link density ≤ `maxLinkPpm` (navigation/footer chrome is short and
   * link-dense — jusText's discriminator), reassemble per doc in block
   * order. Output: `(id, text, n_blocks_kept, n_blocks_dropped)`.
   */
  def extractContent(docs: DataFrame, idCol: String, htmlCol: String,
      minChars: Long = 20L, maxLinkPpm: Long = 300000L): DataFrame = {
    val blocks = blocksWithDensity(docs, idCol, htmlCol)
    val kept = when(col("n_chars") >= minChars &&
      col("link_ppm") <= maxLinkPpm, 1L).otherwise(0L)
    val agg = blocks
      .withColumn("__keep", kept)
      .groupBy(col(idCol))
      .agg(
        concat_ws("\n", sort_array(collect_list(
          when(col("__keep") === 1L,
            struct(col("block_idx"), col("block_text")))))
          .getField("block_text")).as("text"),
        sum(col("__keep")).as("n_blocks_kept"),
        (count(lit(1)) - sum(col("__keep"))).as("n_blocks_dropped"))
    // a doc whose every block is empty (html="", all-chrome page) has no
    // exploded rows at all — join back so it surfaces as (id, "", 0, 0),
    // matching the inline twin, instead of silently vanishing
    docs.select(col(idCol)).distinct()
      .join(agg, Seq(idCol), "left")
      .select(col(idCol), coalesce(col("text"), lit("")).as("text"),
        coalesce(col("n_blocks_kept"), lit(0L)).as("n_blocks_kept"),
        coalesce(col("n_blocks_dropped"), lit(0L)).as("n_blocks_dropped"))
  }

  /**
   * PER-ROW twin of [[extractContent]]: the block split, per-block
   * extraction/density, gate, and reassembly all run inside one row via
   * array higher-order functions — no explode, no groupBy; rows never
   * fan out. Identical output values (spec-pinned); the exploded
   * spelling stays for ad-hoc block-level policies
   * ([[blocksWithDensity]]) and is the faster BATCH shape. Because no
   * stage is stateful it runs unchanged on a STREAM — the streaming
   * crawl front door needs no watermark and no state store.
   *
   * The heavy regex chain is materialized behind a round-robin exchange
   * before the gate: HOF lambdas get no common-subexpression
   * elimination, so the three output columns referencing the enriched
   * array would otherwise re-run the whole per-block extraction 3× per
   * row (measured 6× at sf0.1 — the repo-wide "no CSE through HOFs"
   * trap). The exchange moves extracted text (smaller than the raw
   * HTML), once.
   */
  def extractContentInline(docs: DataFrame, idCol: String, htmlCol: String,
      minChars: Long = 20L, maxLinkPpm: Long = 300000L): DataFrame = {
    val split_re = s"(?i)</?(?:$BlockTags)\\b[^>]*>"
    val enriched = transform(
      split(stripIslands(col(htmlCol)), split_re), b => {
        val t = htmlToText(b)
        val n = length(t).cast("long")
        struct(t.as("text"), n.as("n_chars"),
          when(n === 0L, lit(1000000L))
            .otherwise(least(lit(1000000L),
              floor(anchorChars(b) * lit(1000000L) / n).cast("long")))
            .as("link_ppm"))
      })
    val blocks = docs.select(col(idCol), enriched.as("__blocks"))
      .repartition(docs.sparkSession.sparkContext.defaultParallelism)
    val nonEmpty = filter(col("__blocks"), s => s.getField("n_chars") > 0L)
    val kept = filter(nonEmpty, s =>
      s.getField("n_chars") >= minChars &&
        s.getField("link_ppm") <= maxLinkPpm)
    blocks.select(col(idCol),
      concat_ws("\n", transform(kept, _.getField("text"))).as("text"),
      size(kept).cast("long").as("n_blocks_kept"),
      (size(nonEmpty) - size(kept)).cast("long").as("n_blocks_dropped"))
  }

  /** `<a>` element pattern: group 1 = the href value (either quote
   * style), group 2 = the inner HTML (lazy, up to the closing tag). */
  private val AnchorRe =
    "(?is)<a\\b[^>]*?href\\s*=\\s*['\"]([^'\"]*)['\"][^>]*>(.*?)</a\\s*>"

  /**
   * Every `<a href=…>…</a>` of every document, in document order —
   * the raw material of the crawl link graph and of anchor-text
   * signals. Output: `(id, link_idx, href, anchor)` where `anchor` is
   * the link's visible text (inner tags stripped, entities decoded,
   * whitespace collapsed). Map-only: two `regexp_extract_all` passes
   * over the island-stripped page (one per capture group — the
   * extraction primitive yields one group at a time) zipped positionally,
   * then one `posexplode`; no shuffle, no UDF. Links inside
   * script/style/comment islands are excluded ([[stripIslands]] runs
   * first); unquoted `href=x` values are out of scope (documented, like
   * the rest of the tag-soup contract).
   */
  def extractLinks(docs: DataFrame, idCol: String, htmlCol: String): DataFrame = {
    val clean = stripIslands(col(htmlCol))
    val hrefs = regexp_extract_all(clean, lit(AnchorRe), lit(1))
    val inners = regexp_extract_all(clean, lit(AnchorRe), lit(2))
    docs
      .select(col(idCol), posexplode(arrays_zip(hrefs.as("h"), inners.as("i")))
        .as(Seq("link_idx", "__z")))
      .select(col(idCol), col("link_idx").cast("long").as("link_idx"),
        col("__z.h").as("href"),
        trim(regexp_replace(decodeEntities(
          regexp_replace(col("__z.i"), "(?s)<[^>]*>", "")),
          "\\s+", " ")).as("anchor"))
  }

  /**
   * Resolve a link target to its HOST: absolute (`http://h/…`,
   * `https://h/…`) and protocol-relative (`//h/…`) links yield their
   * own authority (userinfo skipped, port/path/query stripped,
   * lowercased — the same authority grammar as
   * [[TextFunctions.urlHosts]]); any OTHER scheme (`mailto:`,
   * `javascript:`, `ftp:`…) yields NULL (not a crawl edge); everything
   * else is a relative link and resolves to `baseHost`.
   */
  def linkHost(href: Column, baseHost: Column): Column = {
    val abs = regexp_extract(href,
      "^(?i)(?:https?:)?//(?:[^/@?#]*@)?([^/:?#]+)", 1)
    when(length(abs) > 0, lower(abs))
      .when(regexp_like(href, lit("^[A-Za-z][A-Za-z0-9+.-]*:")),
        lit(null).cast("string"))
      .otherwise(lower(baseHost))
  }

  /**
   * Host-level link graph of a crawl slice: extract every anchor,
   * resolve each to a destination host against the page's own host,
   * and aggregate to weighted edges `(src_host, dst_host, w)` where
   * `w` counts links. The 100 TB shape: extraction is map-only; the
   * single keyed shuffle aggregates on host PAIRS (hosts ≪ pages in
   * any real crawl, so partial map-side combine collapses most of the
   * volume before the exchange). Self-loops (intra-host links) are
   * kept — rank callers drop them ([[Graph.pageRank]] requires it);
   * blocklist callers want them.
   */
  def linkGraph(docs: DataFrame, idCol: String, htmlCol: String,
      hostCol: String): DataFrame = {
    // hrefs only — no anchor text, no zip, no join back to docs: one
    // regexp pass with the src host riding alongside
    val hrefs = regexp_extract_all(stripIslands(col(htmlCol)),
      lit(AnchorRe), lit(1))
    docs
      .select(lower(col(hostCol)).as("src_host"), explode(hrefs).as("href"))
      .withColumn("dst_host", linkHost(col("href"), col("src_host")))
      .filter(col("dst_host").isNotNull)
      .groupBy(col("src_host"), col("dst_host"))
      .agg(count(lit(1)).as("w"))
  }

  /** [[htmlBlocks]] with the anchor-char numerator computed per block —
   * the exploded frame both [[extractContent]] and ad-hoc policies
   * filter. */
  def blocksWithDensity(docs: DataFrame, idCol: String,
      htmlCol: String): DataFrame = {
    val split_re = s"(?i)</?(?:$BlockTags)\\b[^>]*>"
    docs
      .withColumn("__clean", stripIslands(col(htmlCol)))
      .select(col(idCol),
        posexplode(split(col("__clean"), split_re)).as(Seq("block_idx", "__raw")))
      .withColumn("block_text", htmlToText(col("__raw")))
      .filter(length(col("block_text")) > 0)
      .withColumn("n_chars", length(col("block_text")).cast("long"))
      .withColumn("__anchor", anchorChars(col("__raw")))
      .withColumn("link_ppm",
        least(lit(1000000L), expr("__anchor * 1000000 div n_chars")))
      .drop("__raw", "__anchor")
  }
}
