package graft.queries

import graft.{Det, QueryDef, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Scalar-function sweep (SURVEY §2.3 families: string, date/time, math,
  * conditional, array, map, JSON). All codegen'd built-ins — no UDFs in
  * the hot path. Oracle SQL casts DuckDB's wider return types (BIGINT
  * length/year/etc.) down to Spark's (INT) so schemas align, and
  * half-up FLOOR-quantizes transcendentals (exp/ln/trig, Det.u6) onto a
  * 1e6 integer grid since libm implementations are not bit-identical
  * across engines — FLOOR(x*1e6+0.5), never ROUND-on-double, which is
  * implementation-defined at digit boundaries across DuckDB versions.
  */
object FunctionsQ {

  val all: Seq[QueryDef] = Seq(
    QueryDef(
      "fn_string_basic",
      """SELECT p_partkey,
        |       CONCAT(p_brand, ':', p_type) AS brand_type,
        |       UPPER(p_name) AS uname,
        |       LOWER(p_brand) AS lbrand,
        |       TRIM(CONCAT(' ', p_name, ' ')) AS trimmed,
        |       CAST(LENGTH(p_name) AS INT) AS name_len,
        |       SUBSTRING(p_name, 1, 5) AS name5
        |FROM part""".stripMargin) { (s, d) =>
      Tables.part(s, d).select(
        col("p_partkey"),
        concat(col("p_brand"), lit(":"), col("p_type")).as("brand_type"),
        upper(col("p_name")).as("uname"),
        lower(col("p_brand")).as("lbrand"),
        trim(concat(lit(" "), col("p_name"), lit(" "))).as("trimmed"),
        length(col("p_name")).as("name_len"),
        substring(col("p_name"), 1, 5).as("name5"))
    },

    QueryDef(
      "fn_string_regex",
      // Array outputs are JSON-encoded on BOTH sides: the driver's pandas
      // comparator cannot sort ndarray cells, so the contract is
      // strings-only output columns (VERDICT r3 item 1).
      """SELECT p_partkey,
        |       CAST(to_json(string_split_regex(p_type, '\s+')) AS VARCHAR) AS type_words,
        |       regexp_extract(p_name, '([a-z]+)', 1) AS first_word,
        |       regexp_replace(p_name, '[aeiou]', '_', 'g') AS devoweled,
        |       p_name LIKE '%blue%' AS is_blue,
        |       split_part(p_brand, '#', 2) AS brand_num
        |FROM part""".stripMargin) { (s, d) =>
      Tables.part(s, d).select(
        col("p_partkey"),
        to_json(split(col("p_type"), "\\s+")).as("type_words"),
        regexp_extract(col("p_name"), "([a-z]+)", 1).as("first_word"),
        regexp_replace(col("p_name"), "[aeiou]", "_").as("devoweled"),
        col("p_name").like("%blue%").as("is_blue"),
        element_at(split(col("p_brand"), "#"), 2).as("brand_num"))
    },

    QueryDef(
      // regexp_extract capture groups with SCALAR outputs — direct green
      // coverage independent of the JSON-encoded array queries.
      "fn_regexp_groups",
      """SELECT p_partkey,
        |       regexp_extract(p_brand, 'Brand#(\d)(\d)', 1) AS brand_d1,
        |       regexp_extract(p_brand, 'Brand#(\d)(\d)', 2) AS brand_d2,
        |       regexp_extract(p_type, '^(\w+)\s+(\w+)', 2) AS type_w2,
        |       CAST(regexp_matches(p_name, '^[a-n]') AS BOOLEAN) AS starts_low
        |FROM part""".stripMargin) { (s, d) =>
      Tables.part(s, d).select(
        col("p_partkey"),
        regexp_extract(col("p_brand"), "Brand#(\\d)(\\d)", 1).as("brand_d1"),
        regexp_extract(col("p_brand"), "Brand#(\\d)(\\d)", 2).as("brand_d2"),
        regexp_extract(col("p_type"), "^(\\w+)\\s+(\\w+)", 2).as("type_w2"),
        col("p_name").rlike("^[a-n]").as("starts_low"))
    },

    QueryDef(
      "fn_string_extra",
      """SELECT p_partkey,
        |       lpad(p_brand, 12, '*') AS padded_l,
        |       rpad(p_brand, 12, '.') AS padded_r,
        |       replace(p_type, ' ', '_') AS snake_type,
        |       reverse(p_brand) AS rev_brand,
        |       repeat(p_brand, 2) AS double_brand,
        |       left(p_name, 4) AS name_l4,
        |       right(p_name, 4) AS name_r4,
        |       CAST(instr(p_name, 'a') AS BIGINT) AS first_a,
        |       CAST(ascii(p_brand) AS INT) AS brand_code
        |FROM part""".stripMargin) { (s, d) =>
      Tables.part(s, d).select(
        col("p_partkey"),
        lpad(col("p_brand"), 12, "*").as("padded_l"),
        rpad(col("p_brand"), 12, ".").as("padded_r"),
        regexp_replace(col("p_type"), " ", "_").as("snake_type"),
        reverse(col("p_brand")).as("rev_brand"),
        repeat(col("p_brand"), 2).as("double_brand"),
        substring(col("p_name"), 1, 4).as("name_l4"),
        expr("right(p_name, 4)").as("name_r4"),
        instr(col("p_name"), "a").cast("bigint").as("first_a"),
        ascii(col("p_brand")).as("brand_code"))
    },

    QueryDef(
      "fn_date_extra",
      """SELECT o_orderkey,
        |       last_day(CAST(o_orderdate AS DATE)) AS month_end,
        |       CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS plus3m,
        |       CAST(date_part('quarter', o_orderdate) AS INT) AS q,
        |       CAST(date_part('isodow', o_orderdate) AS INT) AS iso_dow
        |FROM orders WHERE o_orderkey < 3000""".stripMargin) { (s, d) =>
      Tables.orders(s, d).filter(col("o_orderkey") < 3000).select(
        col("o_orderkey"),
        last_day(col("o_orderdate")).as("month_end"),
        (add_months(col("o_orderdate"), 3)).cast("timestamp").as("plus3m"),
        quarter(col("o_orderdate")).as("q"),
        expr("weekday(o_orderdate) + 1").as("iso_dow"))
    },

    QueryDef(
      // ISO week / day-of-year / date construction / day arithmetic.
      "fn_date_more",
      """SELECT o_orderkey,
        |       CAST(week(CAST(o_orderdate AS DATE)) AS INT) AS wk,
        |       CAST(dayofyear(CAST(o_orderdate AS DATE)) AS INT) AS doy,
        |       CAST(o_orderdate AS DATE) - 7 AS minus7,
        |       make_date(2000, CAST(month(o_orderdate) AS INT), 1) AS m_start
        |FROM orders WHERE o_orderkey < 3000""".stripMargin) { (s, d) =>
      Tables.orders(s, d).filter(col("o_orderkey") < 3000).select(
        col("o_orderkey"),
        weekofyear(col("o_orderdate")).as("wk"),
        dayofyear(col("o_orderdate")).as("doy"),
        date_sub(col("o_orderdate"), 7).as("minus7"),
        make_date(lit(2000), month(col("o_orderdate")), lit(1)).as("m_start"))
    },

    QueryDef(
      // Linear-regression aggregates over (discount -> extendedprice);
      // rounded: the sums-of-products fold order differs across engines.
      "agg_regression",
      """SELECT l_linestatus,
        |       CAST(FLOOR(regr_slope(l_extendedprice, l_discount) * 1e4 + 0.5) AS BIGINT) AS slope_u4,
        |       CAST(FLOOR(regr_intercept(l_extendedprice, l_discount) * 1e4 + 0.5) AS BIGINT) AS icept_u4,
        |       CAST(FLOOR(regr_r2(l_extendedprice, l_discount) * 1e6 + 0.5) AS BIGINT) AS r2_u6,
        |       CAST(FLOOR(regr_avgx(l_extendedprice, l_discount) * 1e6 + 0.5) AS BIGINT) AS avgx_u6,
        |       CAST(regr_count(l_extendedprice, l_discount) AS BIGINT) AS n
        |FROM lineitem GROUP BY l_linestatus""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d).groupBy("l_linestatus").agg(
        Det.uN(regr_slope(col("l_extendedprice"), col("l_discount")), 4).as("slope_u4"),
        Det.uN(regr_intercept(col("l_extendedprice"), col("l_discount")), 4).as("icept_u4"),
        Det.u6(regr_r2(col("l_extendedprice"), col("l_discount"))).as("r2_u6"),
        Det.u6(regr_avgx(col("l_extendedprice"), col("l_discount"))).as("avgx_u6"),
        regr_count(col("l_extendedprice"), col("l_discount")).as("n"))
    },

    QueryDef(
      // Skewness / kurtosis from exact decimal power sums (s1..s4) with
      // an identical double expression tree on both sides — the same
      // discipline as agg_var_stddev / agg_corr_covar. l_quantity is
      // integral, so q^3 / q^4 are exact in double BEFORE the decimal
      // cast (no cross-engine rounding seam). A test ties these to
      // Spark's built-in skewness()/kurtosis() within 1e-9.
      "agg_skew_kurt",
      """WITH m AS (
        |  SELECT l_returnflag,
        |         CAST(COUNT(l_quantity) AS DOUBLE) AS n,
        |         CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS s1,
        |         CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(24,4))) AS DOUBLE) AS s2,
        |         CAST(SUM(CAST(l_quantity * l_quantity * l_quantity AS DECIMAL(30,4))) AS DOUBLE) AS s3,
        |         CAST(SUM(CAST(l_quantity * l_quantity * l_quantity * l_quantity AS DECIMAL(38,4))) AS DOUBLE) AS s4
        |  FROM lineitem GROUP BY l_returnflag),
        |c AS (
        |  SELECT l_returnflag,
        |         (s2 - s1 * s1 / n) / n AS m2,
        |         (s3 - 3 * (s1 / n) * s2 + 2 * n * (s1 / n) * (s1 / n) * (s1 / n)) / n AS m3,
        |         (s4 - 4 * (s1 / n) * s3 + 6 * (s1 / n) * (s1 / n) * s2
        |            - 3 * n * (s1 / n) * (s1 / n) * (s1 / n) * (s1 / n)) / n AS m4
        |  FROM m)
        |SELECT l_returnflag,
        |       m3 / SQRT(m2 * m2 * m2) AS skew_qty,
        |       m4 / (m2 * m2) - 3 AS kurt_qty
        |FROM c""".stripMargin) { (s, d) =>
      val q = col("l_quantity")
      val m = Tables.lineitem(s, d).groupBy("l_returnflag").agg(
        count(q).cast("double").as("n"),
        sum(q.cast(DecimalType(18, 2))).cast("double").as("s1"),
        sum((q * q).cast(DecimalType(24, 4))).cast("double").as("s2"),
        sum((q * q * q).cast(DecimalType(30, 4))).cast("double").as("s3"),
        sum((q * q * q * q).cast(DecimalType(38, 4))).cast("double").as("s4"))
      val n = col("n"); val s1 = col("s1"); val s2 = col("s2")
      val s3 = col("s3"); val s4 = col("s4")
      val mu = s1 / n
      val m2 = (s2 - s1 * s1 / n) / n
      val m3 = (s3 - lit(3) * mu * s2 + lit(2) * n * mu * mu * mu) / n
      val m4 = (s4 - lit(4) * mu * s3 + lit(6) * mu * mu * s2
        - lit(3) * n * mu * mu * mu * mu) / n
      // sqrt(m2^3) not pow(m2, 1.5): sqrt and * are IEEE-exact-rounded
      // in both engines, libm pow is not (observed 1-ULP divergence)
      m.select(col("l_returnflag"),
        (m3 / sqrt(m2 * m2 * m2)).as("skew_qty"),
        (m4 / (m2 * m2) - lit(3)).as("kurt_qty"))
    },

    QueryDef(
      // Boolean aggregates (bool_and / bool_or) + conditional count.
      "agg_bool",
      """SELECT l_linestatus,
        |       bool_and(l_quantity > 5) AS all_gt5,
        |       bool_or(l_discount > 0.09) AS any_disc9,
        |       CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS n_returns
        |FROM lineitem GROUP BY l_linestatus""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d).groupBy("l_linestatus").agg(
        bool_and(col("l_quantity") > 5).as("all_gt5"),
        bool_or(col("l_discount") > 0.09).as("any_disc9"),
        sum(when(col("l_returnflag") === "R", 1).otherwise(0)).cast("bigint").as("n_returns"))
    },

    QueryDef(
      "fn_date_parts",
      """SELECT o_orderkey,
        |       CAST(year(o_orderdate) AS INT) AS y,
        |       CAST(month(o_orderdate) AS INT) AS m,
        |       CAST(day(o_orderdate) AS INT) AS dom,
        |       CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start
        |FROM orders""".stripMargin) { (s, d) =>
      Tables.orders(s, d).select(
        col("o_orderkey"),
        year(col("o_orderdate")).as("y"),
        month(col("o_orderdate")).as("m"),
        dayofmonth(col("o_orderdate")).as("dom"),
        date_trunc("month", col("o_orderdate")).as("month_start"))
    },

    QueryDef(
      "fn_date_arith",
      """SELECT l_orderkey, l_linenumber,
        |       CAST(l_shipdate AS DATE) + 30 AS ship_plus30,
        |       CAST(datediff('day', CAST(l_shipdate AS DATE), DATE '1996-01-01') AS INT) AS days_to_96,
        |       CAST(floor(epoch(l_shipdate)) AS BIGINT) AS ship_epoch,
        |       strptime('1995-06-15 12:00:00', '%Y-%m-%d %H:%M:%S') AS fixed_ts
        |FROM lineitem WHERE l_orderkey < 500""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d).filter(col("l_orderkey") < 500).select(
        col("l_orderkey"), col("l_linenumber"),
        date_add(col("l_shipdate"), 30).as("ship_plus30"),
        datediff(lit("1996-01-01").cast("date"), col("l_shipdate")).as("days_to_96"),
        unix_timestamp(col("l_shipdate")).as("ship_epoch"),
        to_timestamp(lit("1995-06-15 12:00:00")).as("fixed_ts"))
    },

    QueryDef(
      "fn_time_bucket",
      // Tumbling event-time window as a batch op: Spark window() struct
      // start == DuckDB time_bucket (both align to the Unix epoch for
      // minute-granularity buckets).
      """SELECT time_bucket(INTERVAL '5 minutes', CAST(ts AS TIMESTAMP)) AS w_start,
        |       event_type,
        |       CAST(COUNT(*) AS BIGINT) AS n,
        |       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
        |FROM events
        |GROUP BY 1, 2""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .groupBy(window(col("ts"), "5 minutes").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,6)")).cast("double").as("sum_value"))
        .select(col("w.start").as("w_start"), col("event_type"), col("n"), col("sum_value"))
    },

    QueryDef(
      "fn_math",
      """SELECT l_orderkey, l_linenumber,
        |       abs(l_discount - 0.05) AS abs_d,
        |       CAST(FLOOR(l_extendedprice + 0.5) AS BIGINT) AS price_r0,
        |       CAST(floor(l_extendedprice) AS BIGINT) AS price_floor,
        |       CAST(ceil(l_extendedprice) AS BIGINT) AS price_ceil,
        |       sqrt(l_quantity) AS qty_sqrt,
        |       pow(l_quantity, 2) AS qty_sq,
        |       CAST(FLOOR(exp(l_discount) * 1e6 + 0.5) AS BIGINT) AS disc_exp_u6,
        |       CAST(FLOOR(ln(l_extendedprice) * 1e6 + 0.5) AS BIGINT) AS price_ln_u6,
        |       CAST(((l_orderkey % 7) + 7) % 7 AS BIGINT) AS key_pmod
        |FROM lineitem WHERE l_orderkey < 1000""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d).filter(col("l_orderkey") < 1000).select(
        col("l_orderkey"), col("l_linenumber"),
        abs(col("l_discount") - 0.05).as("abs_d"),
        Det.uN(col("l_extendedprice"), 0).as("price_r0"),
        floor(col("l_extendedprice")).as("price_floor"),
        ceil(col("l_extendedprice")).as("price_ceil"),
        sqrt(col("l_quantity")).as("qty_sqrt"),
        pow(col("l_quantity"), 2).as("qty_sq"),
        Det.u6(exp(col("l_discount"))).as("disc_exp_u6"),
        Det.u6(log(col("l_extendedprice"))).as("price_ln_u6"),
        pmod(col("l_orderkey"), lit(7)).cast("bigint").as("key_pmod"))
    },

    QueryDef(
      "fn_conditional",
      """SELECT c_custkey,
        |       CASE WHEN c_acctbal < 0 THEN 'debt'
        |            WHEN c_acctbal < 5000 THEN 'low'
        |            ELSE 'high' END AS bal_class,
        |       COALESCE(NULLIF(c_mktsegment, 'BUILDING'), 'OTHER') AS seg,
        |       GREATEST(c_acctbal, 0.0) AS bal_floor0,
        |       LEAST(c_acctbal, 1000.0) AS bal_cap1k
        |FROM customer""".stripMargin) { (s, d) =>
      Tables.customer(s, d).select(
        col("c_custkey"),
        when(col("c_acctbal") < 0, "debt")
          .when(col("c_acctbal") < 5000, "low")
          .otherwise("high").as("bal_class"),
        coalesce(nullif(col("c_mktsegment"), lit("BUILDING")), lit("OTHER")).as("seg"),
        greatest(col("c_acctbal"), lit(0.0)).as("bal_floor0"),
        least(col("c_acctbal"), lit(1000.0)).as("bal_cap1k"))
    },

    QueryDef(
      "fn_array_basic",
      // JSON-encoded array outputs (driver comparator contract; see
      // fn_string_regex note).
      """SELECT n_nationkey,
        |       CAST(to_json([n_nationkey, n_regionkey]) AS VARCHAR) AS keys,
        |       list_contains([n_nationkey, n_regionkey], 1) AS has_one,
        |       CAST(len(string_split_regex(n_name, '')) AS INT) AS n_chars,
        |       CAST(to_json(list_sort(string_split_regex(n_name, ''))) AS VARCHAR) AS sorted_chars,
        |       CAST(to_json(list_sort(list_distinct(string_split_regex(n_name, '')))) AS VARCHAR) AS uniq_chars
        |FROM nation""".stripMargin) { (s, d) =>
      val chars = split(col("n_name"), "")
      Tables.nation(s, d).select(
        col("n_nationkey"),
        to_json(array(col("n_nationkey"), col("n_regionkey"))).as("keys"),
        array_contains(array(col("n_nationkey"), col("n_regionkey")), 1).as("has_one"),
        size(chars).as("n_chars"),
        to_json(sort_array(chars)).as("sorted_chars"),
        to_json(sort_array(array_distinct(chars))).as("uniq_chars"))
    },

    QueryDef(
      "fn_array_hof",
      // JSON-encoded array outputs (driver comparator contract).
      """SELECT n_nationkey,
        |       CAST(to_json(list_transform([n_nationkey, n_regionkey], x -> x * 10)) AS VARCHAR) AS tens,
        |       CAST(to_json(list_filter([n_nationkey, n_regionkey, 42], x -> x > 3)) AS VARCHAR) AS big,
        |       CAST(to_json(flatten([[n_nationkey], [n_regionkey]])) AS VARCHAR) AS flat,
        |       list_reduce([n_nationkey, n_regionkey, 1], (a, b) -> a + b) AS total
        |FROM nation""".stripMargin) { (s, d) =>
      val arr = array(col("n_nationkey"), col("n_regionkey"))
      Tables.nation(s, d).select(
        col("n_nationkey"),
        to_json(transform(arr, x => x * 10)).as("tens"),
        to_json(filter(array(col("n_nationkey"), col("n_regionkey"), lit(42)), x => x > 3)).as("big"),
        to_json(flatten(array(array(col("n_nationkey")), array(col("n_regionkey"))))).as("flat"),
        aggregate(array(col("n_nationkey"), col("n_regionkey"), lit(1)),
          lit(0), (a, b) => a + b).as("total"))
    },

    QueryDef(
      // Array set algebra — intersect/union/except. Both engines leave
      // element order unspecified, so results are sorted then
      // JSON-encoded (driver comparator contract).
      "fn_array_setops",
      """SELECT n_nationkey,
        |       CAST(to_json(list_sort(list_distinct(list_intersect([n_nationkey, n_regionkey, 7], [n_regionkey, 7, 9])))) AS VARCHAR) AS inter,
        |       CAST(to_json(list_sort(list_distinct([n_nationkey, n_regionkey] || [n_regionkey, 9]))) AS VARCHAR) AS uni,
        |       CAST(to_json(list_sort(list_distinct(list_filter([n_nationkey, n_regionkey, 7], x -> NOT list_contains([n_regionkey], x))))) AS VARCHAR) AS exc
        |FROM nation""".stripMargin) { (s, d) =>
      val a = array(col("n_nationkey"), col("n_regionkey"), lit(7))
      val b = array(col("n_regionkey"), lit(7), lit(9))
      Tables.nation(s, d).select(
        col("n_nationkey"),
        to_json(sort_array(array_intersect(a, b))).as("inter"),
        to_json(sort_array(array_union(
          array(col("n_nationkey"), col("n_regionkey")),
          array(col("n_regionkey"), lit(9))))).as("uni"),
        to_json(sort_array(array_except(a, array(col("n_regionkey"))))).as("exc"))
    },

    QueryDef(
      // slice / position / repeat (JSON-encoded array outputs). DuckDB
      // list_slice(a,2,3) is 1-based inclusive = Spark slice(a,2,2).
      "fn_array_extra",
      """SELECT n_nationkey,
        |       CAST(to_json(list_slice([n_nationkey, n_regionkey, 7, 9], 2, 3)) AS VARCHAR) AS sl,
        |       CAST(list_position([n_regionkey, n_nationkey], n_nationkey) AS BIGINT) AS pos,
        |       CAST(to_json(list_transform(range(3), x -> n_regionkey)) AS VARCHAR) AS rep
        |FROM nation""".stripMargin) { (s, d) =>
      Tables.nation(s, d).select(
        col("n_nationkey"),
        to_json(slice(array(col("n_nationkey"), col("n_regionkey"), lit(7), lit(9)), 2, 2)).as("sl"),
        array_position(array(col("n_regionkey"), col("n_nationkey")), col("n_nationkey")).as("pos"),
        to_json(array_repeat(col("n_regionkey"), 3)).as("rep"))
    },

    QueryDef(
      // Trig + sign + bitwise — rounded where libm implementations
      // differ across engines.
      "fn_math_trig",
      """SELECT l_orderkey, l_linenumber,
        |       CAST(FLOOR(sin(l_quantity) * 1e6 + 0.5) AS BIGINT) AS qty_sin_u6,
        |       CAST(FLOOR(cos(l_quantity) * 1e6 + 0.5) AS BIGINT) AS qty_cos_u6,
        |       CAST(FLOOR(atan2(l_quantity, 10.0) * 1e6 + 0.5) AS BIGINT) AS qty_atan2_u6,
        |       CAST(sign(l_discount - 0.05) AS INT) AS disc_sign,
        |       CAST(l_orderkey & 255 AS BIGINT) AS key_and,
        |       CAST(l_orderkey | 1 AS BIGINT) AS key_or,
        |       CAST(xor(l_orderkey, 21) AS BIGINT) AS key_xor
        |FROM lineitem WHERE l_orderkey < 1000""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d).filter(col("l_orderkey") < 1000).select(
        col("l_orderkey"), col("l_linenumber"),
        Det.u6(sin(col("l_quantity"))).as("qty_sin_u6"),
        Det.u6(cos(col("l_quantity"))).as("qty_cos_u6"),
        Det.u6(atan2(col("l_quantity"), lit(10.0))).as("qty_atan2_u6"),
        signum(col("l_discount") - 0.05).cast("int").as("disc_sign"),
        col("l_orderkey").bitwiseAND(lit(255L)).as("key_and"),
        col("l_orderkey").bitwiseOR(lit(1L)).as("key_or"),
        col("l_orderkey").bitwiseXOR(lit(21L)).as("key_xor"))
    },

    QueryDef(
      // Content hashing / encoding — the identity layer of every dedup
      // and provenance pipeline.
      "fn_hash_encode",
      """SELECT p_partkey,
        |       sha256(p_name) AS sha,
        |       CAST(to_base64(CAST(p_brand AS BLOB)) AS VARCHAR) AS b64,
        |       lower(hex(CAST(p_type AS BLOB))) AS hx,
        |       md5(p_name) AS m5
        |FROM part""".stripMargin) { (s, d) =>
      Tables.part(s, d).select(
        col("p_partkey"),
        sha2(col("p_name").cast("binary"), 256).as("sha"),
        base64(col("p_brand").cast("binary")).as("b64"),
        lower(hex(col("p_type"))).as("hx"),
        md5(col("p_name").cast("binary")).as("m5"))
    },

    QueryDef(
      "fn_string_translate",
      """SELECT p_partkey,
        |       translate(p_name, 'aeiou', '_____') AS consonants,
        |       translate(p_brand, '#', '-') AS dashed
        |FROM part""".stripMargin) { (s, d) =>
      Tables.part(s, d).select(
        col("p_partkey"),
        translate(col("p_name"), "aeiou", "_____").as("consonants"),
        translate(col("p_brand"), "#", "-").as("dashed"))
    },

    QueryDef(
      // Error-safe functions — under ANSI mode (Spark 4 default) plain
      // division/cast/element_at THROW; the try_ forms return null,
      // matching DuckDB's TRY_CAST / null-on-missing semantics.
      "fn_try_safe",
      """SELECT p_partkey,
        |       CASE WHEN p_partkey % 3 = 0 THEN NULL
        |            ELSE CAST(p_partkey AS DOUBLE) / (p_partkey % 3) END AS div3,
        |       TRY_CAST(p_type AS INT) AS bad_int,
        |       TRY_CAST(split_part(p_brand, '#', 2) AS INT) AS brand_int,
        |       string_split_regex(p_type, '\s+')[9] AS tok9
        |FROM part""".stripMargin) { (s, d) =>
      Tables.part(s, d).select(
        col("p_partkey"),
        expr("try_divide(cast(p_partkey as double), p_partkey % 3)").as("div3"),
        expr("try_cast(p_type as int)").as("bad_int"),
        expr("try_cast(element_at(split(p_brand, '#'), 2) as int)").as("brand_int"),
        expr("try_element_at(split(p_type, '\\\\s+'), 9)").as("tok9"))
    },

    QueryDef(
      "fn_explode",
      """SELECT n_nationkey, unnest([n_nationkey, n_regionkey, 99]) AS v
        |FROM nation""".stripMargin) { (s, d) =>
      Tables.nation(s, d).select(
        col("n_nationkey"),
        explode(array(col("n_nationkey"), col("n_regionkey"), lit(99))).as("v"))
    },

    QueryDef(
      "fn_map",
      // JSON-encoded array outputs (driver comparator contract).
      """WITH m AS (SELECT r_regionkey, MAP {'rk': r_regionkey, 'rk2': r_regionkey * 2} AS mp FROM region)
        |SELECT r_regionkey,
        |       CAST(to_json(map_keys(mp)) AS VARCHAR) AS ks,
        |       CAST(to_json(map_values(mp)) AS VARCHAR) AS vs,
        |       element_at(mp, 'rk2')[1] AS rk2
        |FROM m""".stripMargin) { (s, d) =>
      val mp = map(lit("rk"), col("r_regionkey"), lit("rk2"), col("r_regionkey") * 2)
      Tables.region(s, d).select(
        col("r_regionkey"),
        to_json(map_keys(mp)).as("ks"),
        to_json(map_values(mp)).as("vs"),
        element_at(mp, lit("rk2")).as("rk2"))
    },

    QueryDef(
      "fn_map_explode",
      """WITH m AS (SELECT r_regionkey, MAP {'a': r_regionkey, 'b': r_regionkey + 1} AS mp FROM region)
        |SELECT r_regionkey,
        |       unnest(map_keys(mp)) AS key,
        |       unnest(map_values(mp)) AS value
        |FROM m""".stripMargin) { (s, d) =>
      val mp = map(lit("a"), col("r_regionkey"), lit("b"), col("r_regionkey") + 1)
      Tables.region(s, d)
        .select(col("r_regionkey"), explode(mp))
    },

    // Map higher-order functions (transform_keys/values, map_filter,
    // map_zip_with) — the map-HOF slice of the array-HOF family above.
    // DuckDB has no map lambdas, so the oracle computes the SAME
    // results independently from the literal construction (list
    // arithmetic in entry order — Spark maps preserve insertion order,
    // and every map HOF here is order-preserving), making this a
    // genuine cross-check rather than a same-engine echo.
    QueryDef(
      "fn_map_hof",
      """SELECT r_regionkey,
        |       CAST(to_json([r_regionkey * 2, r_regionkey * 3 * 2]) AS VARCHAR) AS tv,
        |       CAST(to_json(['a_x', 'b_x']) AS VARCHAR) AS tk,
        |       CAST(to_json(list_filter([r_regionkey, r_regionkey * 3], x -> x % 2 = 0)) AS VARCHAR) AS mf,
        |       CAST(to_json([r_regionkey + r_regionkey, r_regionkey * 3 + r_regionkey * 3]) AS VARCHAR) AS mz
        |FROM region""".stripMargin) { (s, d) =>
      val mp = map(lit("a"), col("r_regionkey"), lit("b"), col("r_regionkey") * 3)
      Tables.region(s, d).select(
        col("r_regionkey"),
        to_json(map_values(transform_values(mp, (_, v) => v * 2))).as("tv"),
        to_json(map_keys(transform_keys(mp, (k, _) => concat(k, lit("_x"))))).as("tk"),
        to_json(map_values(map_filter(mp, (_, v) => v % 2 === 0))).as("mf"),
        to_json(map_values(map_zip_with(mp, mp, (_, v1, v2) => v1 + v2))).as("mz"))
    },

    QueryDef(
      "fn_json",
      // events.props carries JSON-in-string — samsa's value convention
      // (/root/reference/README.md:45).
      """SELECT event_id,
        |       json_extract_string(props, '$.k') AS k_str,
        |       CAST(json_extract_string(props, '$.k') AS INT) AS k_int,
        |       CAST(to_json(struct_pack(id := event_id, et := event_type)) AS VARCHAR) AS packed
        |FROM events""".stripMargin) { (s, d) =>
      Tables.events(s, d).select(
        col("event_id"),
        get_json_object(col("props"), "$.k").as("k_str"),
        from_json(col("props"), lit("k INT")).getField("k").as("k_int"),
        to_json(struct(col("event_id").as("id"), col("event_type").as("et"))).as("packed"))
    },

    QueryDef(
      // VARIANT (Spark 4): parse once into the binary semi-structured
      // encoding, then typed path extraction — the 100 TB semi-
      // structured route (shredded binary beats per-query string JSON
      // parsing; Parquet can store/shred it). Values must agree with
      // the string-JSON oracle exactly.
      "fn_variant",
      """SELECT event_id,
        |       json_extract_string(props, '$.k') AS k_str,
        |       CAST(json_extract_string(props, '$.k') AS INT) AS k_int
        |FROM events""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .selectExpr(
          "event_id",
          "parse_json(props) AS v")
        .selectExpr(
          "event_id",
          "variant_get(v, '$.k', 'string') AS k_str",
          "variant_get(v, '$.k', 'int') AS k_int")
    }
  )
}
