package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Lexicon

/** Core relational operators from SURVEY.md §2 (P/U/J/A/W/X/F families),
  * each exposed as a named query over the harness tables plus a DuckDB
  * oracle that computes the identical result.
  *
  * Design rules for 100 TB:
  *  - narrow ops (project/filter/tag/rewrite) stay in one stage, pushed
  *    into the parquet scan by Catalyst;
  *  - dimension joins are explicit `broadcast()` (nation/region/lexicon
  *    are tiny); fact-fact joins shuffle on their keys and rely on AQE;
  *  - windows are ALWAYS partitioned by a key (never a global orderBy,
  *    except the final `orderBy.limit` which Spark executes as
  *    TakeOrderedAndProject — a per-partition top-k + driver merge, not
  *    a global sort).
  */
object Relational {
  type Q = (SparkSession, String) => DataFrame

  // ----------------------------------------------------------------
  // Aggregations (SURVEY §2.6) — headline pricing-summary shape
  // ----------------------------------------------------------------

  /** A-family headline: grouped partial+final hash aggregation. */
  private def q1Agg: Q = (s, dir) =>
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        // money sums in DECIMAL, not double: every money column holds
        // exact 2-decimal values, and double summation order differs
        // between engines — at sf0.1 the total (~5e9) has a double ulp
        // the size of the 6dp rounding quantum, so round(sum(double))
        // flipped its last digit vs the oracle. Decimal sums are exact.
        // The FINAL value casts to double: the driver's comparator
        // stringifies cells (pandas astype(str)), and Spark decimals
        // read back as Decimal('x.40') while DuckDB decimals surface as
        // float x.4 — a one-time correctly-rounded cast of the exact sum
        // is bit-identical in both engines, so the reprs agree.
        round(sum(col("l_quantity")), 6).as("sum_qty"),
        sum(expr("CAST(l_extendedprice AS DECIMAL(18,2))")).cast("double").as("sum_base_price"),
        sum(expr("CAST(l_extendedprice AS DECIMAL(18,2)) * (1.00 - CAST(l_discount AS DECIMAL(3,2)))"))
          .cast("double").as("sum_disc_price"),
        round(avg(col("l_quantity")), 6).as("avg_qty"),
        count(lit(1)).as("count_order"))

  private val q1AggSql =
    """SELECT l_returnflag, l_linestatus,
      | round(sum(l_quantity), 6) AS sum_qty,
      | CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      | CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1.00 - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE) AS sum_disc_price,
      | round(avg(l_quantity), 6) AS avg_qty,
      | count(*) AS count_order
      |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin

  /** Join + agg + ordered-limit headline (TPC-H Q3 shape): two fact
    * joins (shuffle, AQE-planned) + broadcast customer filter, then
    * top-10 by revenue as TakeOrderedAndProject (no global sort). */
  private def q3TopRevenue: Q = (s, dir) => {
    val c = Tables.customer(s, dir).filter(col("c_mktsegment") === "BUILDING")
    val o = Tables.orders(s, dir)
    val l = Tables.lineitem(s, dir)
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"))
      // exact decimal sum, final cast to double (comparator-stable repr)
      .agg(sum(expr("CAST(l_extendedprice AS DECIMAL(18,2)) * (1.00 - CAST(l_discount AS DECIMAL(3,2)))"))
        .cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey").asc)
      .limit(10)
  }

  private val q3TopRevenueSql =
    """SELECT l_orderkey, CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1.00 - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE) AS revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |WHERE c_mktsegment = 'BUILDING'
      |GROUP BY l_orderkey
      |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin

  // ----------------------------------------------------------------
  // Projections / filters (SURVEY §2.3)
  // ----------------------------------------------------------------

  /** P1 — column projection + canonical rename (Rmd:283,:476-477). */
  private def p1ProjectRename: Q = (s, dir) =>
    Tables.customer(s, dir).select(
      col("c_custkey").as("id"),
      col("c_name").as("name"),
      col("c_mktsegment").as("segment"))

  private val p1Sql =
    "SELECT c_custkey AS id, c_name AS name, c_mktsegment AS segment FROM customer"

  /** Shared u1 frame: db_merge of two divergent-schema frames
    * (customer- and supplier-shaped), the reference's central
    * schema-reconciliation op (Rmd:58-73). */
  private def mergedEntities(s: SparkSession, dir: String): DataFrame = {
    val a = Tables.customer(s, dir).select(
      col("c_custkey").as("ekey"), col("c_name").as("ename"),
      col("c_acctbal").as("acctbal"))
    val b = Tables.supplier(s, dir).select(
      col("s_suppkey").as("ekey"), col("s_name").as("ename"),
      col("s_nationkey").as("nation"))
    SchemaUnion.dbMerge(a, b)
  }

  private val mergedEntitiesSql =
    """SELECT c_acctbal AS acctbal, c_custkey AS ekey, c_name AS ename,
      |       CAST(NULL AS INTEGER) AS nation FROM customer
      |UNION ALL
      |SELECT CAST(NULL AS DOUBLE), s_suppkey, s_name, s_nationkey FROM supplier""".stripMargin

  /** U1 — schema-aligning outer union (db_merge): union of column sets,
    * NULL padding, alphabetical column order. */
  private def u1SchemaUnion: Q = (s, dir) => mergedEntities(s, dir)

  /** P2 — null-drop filter on the padded column (Rmd:556,:590). */
  private def p2NullFilter: Q = (s, dir) =>
    mergedEntities(s, dir).filter(col("nation").isNotNull)

  private val p2Sql =
    s"SELECT * FROM ($mergedEntitiesSql) WHERE nation IS NOT NULL"

  /** P3 — equality predicate filter (Rmd:402,:575,:585). */
  private def p3EqFilter: Q = (s, dir) =>
    Tables.lineitem(s, dir)
      .filter(col("l_returnflag") === "R")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"), col("l_returnflag"))

  private val p3Sql =
    """SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
      |FROM lineitem WHERE l_returnflag = 'R'""".stripMargin

  /** P4 — regex predicate filter (Rmd:403,:436). */
  private def p4RegexFilter: Q = (s, dir) =>
    Tables.documents(s, dir)
      .filter(col("text").rlike("\\bspark\\b.*\\bjoin\\b"))
      .select(col("doc_id"), col("lang"))

  private val p4Sql =
    """SELECT doc_id, lang FROM documents
      |WHERE regexp_matches(text, '\bspark\b.*\bjoin\b')""".stripMargin

  /** P5 — row-range slice at an anchor row (Rmd:444-446): everything
    * before the first part whose name mentions the anchor word. The
    * anchor is a 1-row aggregate broadcast to the filter — no global
    * sort, order carried by the key column. */
  private def p5RowSlice: Q = (s, dir) => {
    val p = Tables.part(s, dir)
    val anchor = p.agg(
      min(when(col("p_name").contains("green"), col("p_partkey"))).as("anchor_key"))
    p.crossJoin(broadcast(anchor))
      .filter(col("p_partkey") < coalesce(col("anchor_key"), lit(Long.MaxValue)))
      .select(col("p_partkey"), col("p_name"))
  }

  private val p5Sql =
    """SELECT p_partkey, p_name FROM part
      |WHERE p_partkey < coalesce(
      |  (SELECT min(p_partkey) FROM part WHERE p_name LIKE '%green%'),
      |  9223372036854775807)""".stripMargin

  /** P6 — constant tag column (Rmd:544,:561-562,:587). */
  private def p6ConstTag: Q = (s, dir) =>
    Tables.region(s, dir).select(
      col("r_regionkey"), col("r_name"), lit("Technical").as("source_type"))

  private val p6Sql =
    "SELECT r_regionkey, r_name, 'Technical' AS source_type FROM region"

  /** P7 — conditional value rewrite / URL absolutization (Rmd:275-279). */
  private def p7ConditionalRewrite: Q = (s, dir) =>
    Tables.documents(s, dir).select(
      col("doc_id"),
      when(!col("source").contains("http"),
        concat(lit("https://example.org/"), col("source")))
        .otherwise(col("source")).as("url"))

  private val p7Sql =
    """SELECT doc_id,
      | CASE WHEN NOT contains(source, 'http')
      |      THEN 'https://example.org/' || source ELSE source END AS url
      |FROM documents""".stripMargin

  // ----------------------------------------------------------------
  // Unions / distinct (SURVEY §2.5)
  // ----------------------------------------------------------------

  private val u1Sql = mergedEntitiesSql

  /** U2 — same-schema 3-way UNION ALL of tagged streams (Rmd:589). */
  private def u2UnionAll: Q = (s, dir) => {
    val c = Tables.customer(s, dir)
    def tagged(seg: String, t: String) =
      c.filter(col("c_mktsegment") === seg).select(
        col("c_custkey").as("id"), col("c_name").as("name"), lit(t).as("rec_type"))
    tagged("BUILDING", "Technical")
      .unionByName(tagged("HOUSEHOLD", "Policy"))
      .unionByName(tagged("MACHINERY", "Support"))
  }

  private val u2Sql =
    """SELECT c_custkey AS id, c_name AS name, 'Technical' AS rec_type FROM customer WHERE c_mktsegment = 'BUILDING'
      |UNION ALL
      |SELECT c_custkey, c_name, 'Policy' FROM customer WHERE c_mktsegment = 'HOUSEHOLD'
      |UNION ALL
      |SELECT c_custkey, c_name, 'Support' FROM customer WHERE c_mktsegment = 'MACHINERY'""".stripMargin

  /** U3 — full-row distinct (Rmd:473-474). */
  private def u3Distinct: Q = (s, dir) =>
    Tables.lineitem(s, dir).select(col("l_returnflag"), col("l_linestatus")).distinct()

  private val u3Sql =
    "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem"

  /** U4 — keep-FIRST dedup by key in a deterministic order (Rmd:511):
    * first order per customer. Window row_number (partitioned — scales),
    * NOT bare dropDuplicates (order-nondeterministic, SURVEY §7.5). */
  private def u4KeepFirst: Q = (s, dir) => {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    Tables.orders(s, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("o_custkey"), col("o_orderkey").as("first_order"),
        col("o_totalprice").as("first_price"))
  }

  private val u4Sql =
    """SELECT o_custkey, o_orderkey AS first_order, o_totalprice AS first_price
      |FROM (SELECT *, row_number() OVER (PARTITION BY o_custkey
      |        ORDER BY o_orderdate, o_orderkey) AS rn FROM orders)
      |WHERE rn = 1""".stripMargin

  // ----------------------------------------------------------------
  // Joins (SURVEY §2.4)
  // ----------------------------------------------------------------

  /** J1 — lookup left-join through two broadcast dimensions
    * (Rmd:541-543): the `match()` lookup as broadcast-hash joins. */
  private def j1LookupJoin: Q = (s, dir) => {
    val c = Tables.customer(s, dir)
    val n = Tables.nation(s, dir)
    val r = Tables.region(s, dir)
    c.join(broadcast(n), col("c_nationkey") === col("n_nationkey"), "left")
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"), "left")
      .select(col("c_custkey"), col("n_name").as("nation"), col("r_name").as("region"))
  }

  private val j1Sql =
    """SELECT c_custkey, n_name AS nation, r_name AS region
      |FROM customer
      |LEFT JOIN nation ON c_nationkey = n_nationkey
      |LEFT JOIN region ON n_regionkey = r_regionkey""".stripMargin

  /** Shared classify-and-explode frame for J2/X2: per-document matched
    * practices via HOF filter over the inlined lexicon (regexes
    * compiled once, one narrow codegen'd stage, zero shuffle), exploded
    * OUTER — one row per match plus a NULL row for no-match documents.
    *
    * explode_outer even where inner semantics are wanted (J2 filters
    * the nulls afterwards): Catalyst's InferFiltersFromGenerate puts a
    * size(practices) > 0 filter under an inner explode, which evaluates
    * the whole 12-regex classify expression TWICE per row (measured 2×
    * the runtime); the outer generate gets no inferred filter and the
    * null-drop afterwards is free. */
  private def classifiedPractices(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .withColumn("tokens",
        split(regexp_replace(col("text"), "[\\p{Punct} ]+", " "), " "))
      .withColumn("practices", expr(
        s"""transform(
           |  filter(${Lexicon.sparkArrayLiteral},
           |         kv -> exists(tokens, t -> t rlike concat('(?i)', kv.k))),
           |  kv -> kv.p)""".stripMargin))
      .select(col("doc_id"), explode_outer(col("practices")).as("practice"))

  /** J2 — keyword-containment theta-join (Rmd:513 + :75-88): documents
    * × lexicon on "any token of the normalized text matches the keyword
    * regex, case-insensitively" — many-to-many, inner.
    *
    * NOT planned as a join: a BroadcastNestedLoopJoin with a non-literal
    * `rlike` predicate evaluates an interpreted, per-evaluation-compiled
    * regex for every (row × lexicon-row) pair — measured 90 s at sf0.1
    * in the r1 driver bench vs ~2 s for the classify shape. Because the
    * lexicon is a compile-time constant, the theta-join rewrites to
    * [[classifiedPractices]] minus its no-match NULL rows — identical
    * (doc_id, practice) pairs. At 100 TB this is the difference between
    * a full broadcast-loop pass per keyword and a single scan. */
  private def j2KeywordTheta: Q = (s, dir) =>
    classifiedPractices(s, dir).filter(col("practice").isNotNull)

  private val j2Sql =
    s"""WITH lex(keyword, practice) AS (VALUES ${Lexicon.duckValues}),
       |toks AS (SELECT doc_id,
       |  string_split(regexp_replace(text, '[[:punct:] ]+', ' ', 'g'), ' ') AS tokens
       |  FROM documents)
       |SELECT doc_id, practice FROM toks
       |JOIN lex ON len(list_filter(tokens, t -> regexp_matches(t, '(?i)' || keyword))) > 0""".stripMargin

  // ----------------------------------------------------------------
  // Aggregations (SURVEY §2.6, small)
  // ----------------------------------------------------------------

  /** A1 — distinct values of one column (Rmd:494). */
  private def a1DistinctCol: Q = (s, dir) =>
    Tables.documents(s, dir).select(col("lang")).distinct()

  private val a1Sql = "SELECT DISTINCT lang FROM documents"

  /** A2 — global max of per-row list length (Rmd:412-413). */
  private def a2MaxSize: Q = (s, dir) =>
    Tables.documents(s, dir)
      .agg(max(size(split(col("text"), " "))).cast("long").as("max_tokens"))

  private val a2Sql =
    "SELECT max(len(string_split(text, ' '))) AS max_tokens FROM documents"

  // ----------------------------------------------------------------
  // Windows (SURVEY §2.7)
  // ----------------------------------------------------------------

  /** W1 — stateful fill-forward in document order (Rmd:174-212): the
    * running `last(..., ignoreNulls)` frame, partitioned per user so it
    * scales (never a global orderBy). */
  private def w1FillForward: Q = (s, dir) => {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(s, dir)
      .withColumn("sparse", when(col("value") >= 250.0, col("event_type")))
      .select(col("event_id"), col("user_id"),
        last(col("sparse"), ignoreNulls = true).over(w).as("filled"))
  }

  private val w1Sql =
    """SELECT event_id, user_id,
      | last_value(CASE WHEN value >= 250.0 THEN event_type END IGNORE NULLS)
      |   OVER (PARTITION BY user_id ORDER BY ts, event_id
      |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled
      |FROM events""".stripMargin

  /** W2 — ordered preview, sort + limit with stabilized ties (Rmd:603).
    * Executes as TakeOrderedAndProject. */
  private def w2OrderedLimit: Q = (s, dir) =>
    Tables.part(s, dir)
      .orderBy(col("p_retailprice").desc, col("p_partkey").asc)
      .select(col("p_partkey"), col("p_name"), col("p_retailprice"))
      .limit(10)

  private val w2Sql =
    """SELECT p_partkey, p_name, p_retailprice FROM part
      |ORDER BY p_retailprice DESC, p_partkey LIMIT 10""".stripMargin

  /** W3 — positional repair (Rmd:575-580): the first 5 'de' documents
    * in doc order get `source` overwritten from a 5-row repair table
    * joined BY POSITION (rank within the partition). */
  private def w3PositionalRepair: Q = (s, dir) => {
    val repair = s.createDataFrame(Seq(
      (1, "repair-a"), (2, "repair-b"), (3, "repair-c"),
      (4, "repair-d"), (5, "repair-e"))).toDF("rpos", "fixed")
    val w = Window.partitionBy(col("lang")).orderBy(col("doc_id"))
    Tables.documents(s, dir)
      .withColumn("pos", row_number().over(w))
      .join(broadcast(repair),
        col("lang") === lit("de") && col("pos") === col("rpos"), "left")
      .select(col("doc_id"), col("lang"),
        coalesce(col("fixed"), col("source")).as("source_fixed"))
  }

  private val w3Sql =
    """WITH repair(rpos, fixed) AS (VALUES
      |  (1,'repair-a'), (2,'repair-b'), (3,'repair-c'), (4,'repair-d'), (5,'repair-e')),
      |d AS (SELECT doc_id, lang, source,
      |        row_number() OVER (PARTITION BY lang ORDER BY doc_id) AS pos
      |      FROM documents)
      |SELECT doc_id, lang, coalesce(fixed, source) AS source_fixed
      |FROM d LEFT JOIN repair ON lang = 'de' AND pos = rpos""".stripMargin

  // ----------------------------------------------------------------
  // Row expansion / nested (SURVEY §2.8)
  // ----------------------------------------------------------------

  /** X1 — nested-tree flatten via two chained INNER explodes with
    * positions (Rmd:216-270): sentences that are "too short" are
    * dropped (the paragraphs-without-links rule), survivors explode to
    * one row per word. */
  private def x1DoubleExplode: Q = (s, dir) =>
    Tables.documents(s, dir)
      .select(col("doc_id"),
        posexplode(split(col("text"), " the ")).as(Seq("sent_idx", "sentence")))
      .filter(size(split(col("sentence"), " ")) > 3)
      .select(col("doc_id"), col("sent_idx").cast("long").as("sent_idx"),
        posexplode(split(col("sentence"), " ")).as(Seq("word_idx", "word")))
      .select(col("doc_id"), col("sent_idx"),
        col("word_idx").cast("long").as("word_idx"), col("word"))

  private val x1Sql =
    """WITH s AS (
      |  SELECT doc_id,
      |         unnest(range(1, len(sents) + 1)) - 1 AS sent_idx,
      |         unnest(sents) AS sentence
      |  FROM (SELECT doc_id, string_split(text, ' the ') AS sents FROM documents)),
      |k AS (SELECT * FROM s WHERE len(string_split(sentence, ' ')) > 3)
      |SELECT doc_id, sent_idx,
      |       unnest(range(1, len(words) + 1)) - 1 AS word_idx,
      |       unnest(words) AS word
      |FROM (SELECT doc_id, sent_idx, string_split(sentence, ' ') AS words FROM k)""".stripMargin

  /** X2 — multi-label classification + explode_outer (Rmd:515-539):
    * per-document matched practices IN LEXICON ORDER via higher-order
    * filter/transform (the faithful detect.csa), then one row per
    * match, and an explicit NULL row when nothing matched. Pure
    * narrow ops — no shuffle at all. (= [[classifiedPractices]].) */
  private def x2ClassifyExplodeOuter: Q = (s, dir) =>
    classifiedPractices(s, dir)

  private val x2Sql =
    s"""SELECT doc_id,
       | unnest(CASE WHEN len(practices) = 0 THEN [NULL] ELSE practices END) AS practice
       |FROM (
       |  SELECT doc_id,
       |    list_transform(
       |      list_filter(${Lexicon.duckListLiteral},
       |        kv -> len(list_filter(tokens,
       |                t -> regexp_matches(t, '(?i)' || kv.k))) > 0),
       |      kv -> kv.p) AS practices
       |  FROM (SELECT doc_id,
       |          string_split(regexp_replace(text, '[[:punct:] ]+', ' ', 'g'), ' ') AS tokens
       |        FROM documents))""".stripMargin

  /** X3 — ragged split + pad to rectangle (Rmd:404-420): split, pad
    * with "" to width 4, project fixed columns. */
  private def x3SplitPad: Q = (s, dir) => {
    val parts = split(col("p_name"), " ")
    val padded = slice(concat(parts, array_repeat(lit(""), 4)), 1, 4)
    Tables.part(s, dir).select(
      col("p_partkey"),
      element_at(padded, 1).as("c1"), element_at(padded, 2).as("c2"),
      element_at(padded, 3).as("c3"), element_at(padded, 4).as("c4"))
  }

  private val x3Sql =
    """SELECT p_partkey, padded[1] AS c1, padded[2] AS c2, padded[3] AS c3, padded[4] AS c4
      |FROM (SELECT p_partkey,
      |        (string_split(p_name, ' ') || ['', '', '', ''])[1:4] AS padded
      |      FROM part)""".stripMargin

  /** F9 — the array-function family over tokenized part names: sort,
    * distinct-count, overlap test, first/last element — all emitted as
    * scalars/strings (array cells crash the driver comparator). Narrow
    * codegen'd projection; the DuckDB twins are list_sort /
    * list_distinct / list_has_any / list extracts. */
  private def fArrays: Q = (s, dir) =>
    Tables.part(s, dir)
      .withColumn("toks", split(col("p_name"), " "))
      .select(
        col("p_partkey"),
        array_join(array_sort(col("toks")), "|").as("sorted_name"),
        size(array_distinct(col("toks"))).cast("long").as("n_distinct_toks"),
        arrays_overlap(col("toks"), array(lit("green"), lit("blue"))).as("has_cool_color"),
        element_at(col("toks"), 1).as("first_tok"),
        element_at(col("toks"), -1).as("last_tok"))

  private val fArraysSql =
    """SELECT p_partkey,
      | array_to_string(list_sort(toks), '|') AS sorted_name,
      | len(list_distinct(toks))::BIGINT AS n_distinct_toks,
      | list_has_any(toks, ['green', 'blue']) AS has_cool_color,
      | toks[1] AS first_tok,
      | toks[-1] AS last_tok
      |FROM (SELECT p_partkey, string_split(p_name, ' ') AS toks FROM part)""".stripMargin

  /** F10 — the bitwise function family over order/part keys: AND, OR,
    * XOR, shifts, popcount — the primitives under bitmap indexes,
    * bloom-filter arithmetic, and the simhash/band bucketing this
    * engine uses internally, surfaced as first-class scalars. Narrow
    * codegen'd projection, zero shuffle. */
  private def fBits: Q = (s, dir) =>
    Tables.lineitem(s, dir)
      .select(
        col("l_orderkey"), col("l_partkey"),
        col("l_orderkey").bitwiseAND(col("l_partkey")).as("b_and"),
        col("l_orderkey").bitwiseOR(col("l_partkey")).as("b_or"),
        col("l_orderkey").bitwiseXOR(col("l_partkey")).as("b_xor"),
        shiftleft(col("l_orderkey"), 2).as("b_shl"),
        shiftright(col("l_orderkey"), 1).as("b_shr"),
        bit_count(col("l_orderkey")).cast("long").as("b_pop"))

  private val fBitsSql =
    """SELECT l_orderkey, l_partkey,
      | l_orderkey & l_partkey AS b_and,
      | l_orderkey | l_partkey AS b_or,
      | xor(l_orderkey, l_partkey) AS b_xor,
      | l_orderkey << 2 AS b_shl,
      | l_orderkey >> 1 AS b_shr,
      | bit_count(l_orderkey)::BIGINT AS b_pop
      |FROM lineitem""".stripMargin

  /** X4 — UNPIVOT (wide → long): the inverse of a7_pivot, melting two
    * customer numeric columns into (metric, amount) rows via `stack` —
    * a codegen'd generator, rows ×2 produced map-side with no shuffle
    * at all (the narrow reshape before a tall groupBy). */
  private def x4Unpivot: Q = (s, dir) =>
    Tables.customer(s, dir)
      .selectExpr("c_custkey",
        """stack(2,
          |  'acctbal', CAST(c_acctbal AS DOUBLE),
          |  'nationkey_x100', CAST(c_nationkey AS DOUBLE) * 100
          |) AS (metric, amount)""".stripMargin)

  private val x4Sql =
    """SELECT c_custkey, metric, amount FROM (
      |  SELECT c_custkey, 'acctbal' AS metric, CAST(c_acctbal AS DOUBLE) AS amount FROM customer
      |  UNION ALL
      |  SELECT c_custkey, 'nationkey_x100', c_nationkey::DOUBLE * 100 FROM customer)""".stripMargin

  // ----------------------------------------------------------------
  // Scalar string functions (SURVEY §2.9)
  // ----------------------------------------------------------------

  /** F2/F3/F4/F5/F7 in one projection: bracket strip, whitespace
    * collapse, code extraction, URL templating, containment. */
  private def fStrings: Q = (s, dir) =>
    Tables.documents(s, dir).select(
      col("doc_id"),
      regexp_replace(concat(lit("["), col("lang"), lit("] "), col("text")),
        "\\[.*?\\]", "").as("f2_strip"),
      regexp_replace(col("text"), "  ", " ").as("f3_collapse"),
      regexp_extract(col("source"), "src([0-9]+)", 1).as("f4_code"),
      concat(lit("https://example.org/"),
        regexp_replace(substring(col("text"), 1, 12), " ", "-"),
        lit(".pdf")).as("f5_url"),
      col("text").contains("spark").as("f7_has_spark"))

  private val fStringsSql =
    """SELECT doc_id,
      | regexp_replace('[' || lang || '] ' || text, '\[.*?\]', '', 'g') AS f2_strip,
      | regexp_replace(text, '  ', ' ', 'g') AS f3_collapse,
      | regexp_extract(source, 'src([0-9]+)', 1) AS f4_code,
      | 'https://example.org/' || regexp_replace(substr(text, 1, 12), ' ', '-', 'g') || '.pdf' AS f5_url,
      | contains(text, 'spark') AS f7_has_spark
      |FROM documents""".stripMargin

  /** F6 — description synthesis with R's NA→"NA" string coercion
    * (Rmd:518-521): `coalesce(x, 'NA')` before concat reproduces the
    * golden "NA: NA See NA." artifact semantics. */
  private def f6NaConcat: Q = (s, dir) =>
    Tables.documents(s, dir).select(
      col("doc_id"),
      concat(
        coalesce(nullif(col("lang"), lit("de")), lit("NA")),
        lit(": "), substring(col("text"), 1, 20),
        lit(" See "), coalesce(nullif(col("source"), lit("src0")), lit("NA")),
        lit(".")).as("description"))

  private val f6Sql =
    """SELECT doc_id,
      | coalesce(nullif(lang, 'de'), 'NA') || ': ' || substr(text, 1, 20)
      |   || ' See ' || coalesce(nullif(source, 'src0'), 'NA') || '.' AS description
      |FROM documents""".stripMargin

  /** JSON field extraction from the events props payload. */
  private def fJsonExtract: Q = (s, dir) =>
    Tables.events(s, dir).select(
      col("event_id"),
      get_json_object(col("props"), "$.k").cast("long").as("k"))

  private val fJsonSql =
    "SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k FROM events"

  // ----------------------------------------------------------------

  val queries: Map[String, Q] = Map(
    "q1_agg" -> q1Agg,
    "q3_top_revenue" -> q3TopRevenue,
    "p1_project_rename" -> p1ProjectRename,
    "p2_null_filter" -> p2NullFilter,
    "p3_eq_filter" -> p3EqFilter,
    "p4_regex_filter" -> p4RegexFilter,
    "p5_row_slice" -> p5RowSlice,
    "p6_const_tag" -> p6ConstTag,
    "p7_conditional_rewrite" -> p7ConditionalRewrite,
    "u1_schema_union" -> u1SchemaUnion,
    "u2_union_all" -> u2UnionAll,
    "u3_distinct" -> u3Distinct,
    "u4_keepfirst_dedup" -> u4KeepFirst,
    "j1_lookup_join" -> j1LookupJoin,
    "j2_keyword_theta_join" -> j2KeywordTheta,
    "a1_distinct_col" -> a1DistinctCol,
    "a2_max_size" -> a2MaxSize,
    "w1_fill_forward" -> w1FillForward,
    "w2_ordered_limit" -> w2OrderedLimit,
    "w3_positional_repair" -> w3PositionalRepair,
    "x1_double_explode" -> x1DoubleExplode,
    "x2_classify_explode_outer" -> x2ClassifyExplodeOuter,
    "x3_split_pad" -> x3SplitPad,
    "x4_unpivot" -> x4Unpivot,
    "f_arrays" -> fArrays,
    "f_bits" -> fBits,
    "f_strings" -> fStrings,
    "f6_na_concat" -> f6NaConcat,
    "f_json_extract" -> fJsonExtract)

  val oracles: Map[String, String] = Map(
    "q1_agg" -> q1AggSql,
    "q3_top_revenue" -> q3TopRevenueSql,
    "p1_project_rename" -> p1Sql,
    "p2_null_filter" -> p2Sql,
    "p3_eq_filter" -> p3Sql,
    "p4_regex_filter" -> p4Sql,
    "p5_row_slice" -> p5Sql,
    "p6_const_tag" -> p6Sql,
    "p7_conditional_rewrite" -> p7Sql,
    "u1_schema_union" -> u1Sql,
    "u2_union_all" -> u2Sql,
    "u3_distinct" -> u3Sql,
    "u4_keepfirst_dedup" -> u4Sql,
    "j1_lookup_join" -> j1Sql,
    "j2_keyword_theta_join" -> j2Sql,
    "a1_distinct_col" -> a1Sql,
    "a2_max_size" -> a2Sql,
    "w1_fill_forward" -> w1Sql,
    "w2_ordered_limit" -> w2Sql,
    "w3_positional_repair" -> w3Sql,
    "x1_double_explode" -> x1Sql,
    "x2_classify_explode_outer" -> x2Sql,
    "x3_split_pad" -> x3Sql,
    "x4_unpivot" -> x4Sql,
    "f_arrays" -> fArraysSql,
    "f_bits" -> fBitsSql,
    "f_strings" -> fStringsSql,
    "f6_na_concat" -> f6Sql,
    "f_json_extract" -> fJsonSql)
}
