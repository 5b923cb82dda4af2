package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The reference's second-widest projection surface: history_effects
  * (reference schemas/history_effects_schema.json — a 70-field `details`
  * RECORD with NUMERIC leaves, eight BOOL flags, repeated asset-amount
  * records and a recursive predicate) and its avro export
  * (reference dags/queries/generate_avro/history_effects.sql:9-79, ~70
  * selected leaves including one transformed column:
  * `safe_cast(details.seller_muxed_id as integer)`).
  *
  * Same pattern as [[HistoryOperations]]: a Scala replica of the data
  * model for the oracled fixture, the export-order flatten, and a
  * generated DuckDB oracle. NUMERIC maps to Decimal(38,9) per the SURVEY
  * §1.2 rules, so the decimal leaves round-trip exactly on both engines.
  */
object HistoryEffects {

  private def f(n: String, t: DataType) = StructField(n, t)
  private def arr(t: DataType) = ArrayType(t, containsNull = true)
  private val dec = DecimalType(38, 9)

  private val assetAmount = StructType(Seq(f("asset", StringType), f("amount", dec)))
  private val reservesRevoked = StructType(Seq(
    f("asset", StringType), f("amount", dec),
    f("claimable_balance_id", StringType), f("claimable_balance_id_strkey", StringType)))
  private val liquidityPool = StructType(Seq(
    f("fee_bp", LongType), f("id", StringType), f("id_strkey", StringType),
    f("total_shares", dec), f("total_trustlines", LongType), f("type", StringType),
    f("reserves", arr(assetAmount))))
  // recursive and/or/not tree in the reference; one level here (the real
  // file parses through SchemaRegistry in RealSchemaSpec)
  private val predicateLeaf = StructType(Seq(
    f("type", LongType), f("unconditional", BooleanType), f("abs_before", StringType),
    f("rel_before", LongType), f("abs_before_epoch", LongType)))

  val detailsSchema: StructType = StructType(Seq(
    f("liquidity_pool", liquidityPool),
    f("reserves_received", arr(assetAmount)),
    f("reserves_deposited", arr(assetAmount)),
    f("reserves_revoked", arr(reservesRevoked)),
    f("bought", arr(assetAmount)), f("sold", arr(assetAmount)),
    f("shares_revoked", dec), f("shares_received", dec), f("shares_redeemed", dec),
    f("liquidity_pool_id", StringType), f("liquidity_pool_id_strkey", StringType),
    f("balance_id", StringType), f("balance_id_strkey", StringType),
    f("new_seq", LongType), f("name", StringType), f("value", StringType),
    f("trustor", StringType), f("limit", dec),
    f("inflation_destination", StringType),
    f("authorized_flag", BooleanType), f("auth_immutable_flag", BooleanType),
    f("authorized_to_maintain_liabilites", BooleanType),
    f("auth_revocable_flag", BooleanType), f("auth_required_flag", BooleanType),
    f("auth_clawback_enabled_flag", BooleanType),
    f("claimable_balance_clawback_enabled_flag", BooleanType),
    f("clawback_enabled_flag", BooleanType),
    f("high_threshold", LongType), f("med_threshold", LongType),
    f("low_threshold", LongType), f("home_domain", StringType),
    f("asset_issuer", StringType), f("asset", StringType),
    f("asset_code", StringType), f("signer", StringType), f("sponsor", StringType),
    f("new_sponsor", StringType), f("former_sponsor", StringType),
    f("weight", LongType), f("public_key", StringType), f("asset_type", StringType),
    f("amount", dec), f("starting_balance", dec),
    f("seller", StringType), f("seller_muxed", StringType),
    f("seller_muxed_id", StringType), f("offer_id", LongType),
    f("sold_amount", dec), f("sold_asset_type", StringType),
    f("sold_asset_code", StringType), f("sold_asset_issuer", StringType),
    f("bought_amount", dec), f("bought_asset_type", StringType),
    f("bought_asset_code", StringType),
    f("predicate", arr(predicateLeaf)),
    f("data_name", StringType), f("bought_asset_issuer", StringType),
    f("entries", arr(StringType)), f("extend_to", LongType),
    f("contract", StringType), f("contract_event_type", StringType)))

  val schema: StructType = StructType(Seq(
    f("address", StringType), f("address_muxed", StringType),
    f("operation_id", LongType), f("type", LongType), f("type_string", StringType),
    f("details", detailsSchema), f("batch_id", StringType),
    f("batch_run_date", TimestampNTZType), f("batch_insert_ts", TimestampType),
    f("closed_at", TimestampType), f("ledger_sequence", LongType),
    f("index", LongType), f("id", StringType)))

  /** Scalar details leaves in the export's select order (the export also
    * names ledgers_to_expire, absent from the schema JSON — schema wins,
    * as for history_operations). seller_muxed_id is handled separately
    * (the one transformed column: safe_cast to integer).
    */
  val scalarDetailCols: Seq[String] = Seq(
    "shares_revoked", "shares_received", "shares_redeemed",
    "liquidity_pool_id", "liquidity_pool_id_strkey", "balance_id",
    "balance_id_strkey", "new_seq", "name", "value", "trustor", "limit",
    "inflation_destination", "authorized_flag", "auth_immutable_flag",
    "authorized_to_maintain_liabilites", "auth_revocable_flag",
    "auth_required_flag", "auth_clawback_enabled_flag",
    "claimable_balance_clawback_enabled_flag", "clawback_enabled_flag",
    "high_threshold", "med_threshold", "low_threshold", "home_domain",
    "asset_issuer", "asset", "asset_code", "signer", "sponsor",
    "new_sponsor", "former_sponsor", "weight", "public_key", "asset_type",
    "amount", "starting_balance", "seller", "seller_muxed", "offer_id",
    "sold_amount", "sold_asset_type", "sold_asset_code",
    "sold_asset_issuer", "bought_amount", "bought_asset_type",
    "bought_asset_code", "data_name", "bought_asset_issuer", "extend_to",
    "contract", "contract_event_type")

  val repeatedDetailCols: Seq[String] = Seq(
    "reserves_received", "reserves_deposited", "reserves_revoked",
    "bought", "sold", "entries")

  /** The export projection: top-level + liquidity_pool record + every
    * selected details leaf in reference order (arrays raw here; the gate
    * variant below reduces them to counts).
    */
  def flattenWide(effects: DataFrame): DataFrame = {
    val top = Seq("address", "address_muxed", "operation_id", "type",
      "type_string", "closed_at", "ledger_sequence", "index", "id").map(col)
    val lp = Seq(col("details.liquidity_pool").as("liquidity_pool"))
    val repeated = repeatedDetailCols.map(n => col(s"details.`$n`").as(n))
    val scalars = scalarDetailCols.map(n => col(s"details.`$n`").as(n))
    val muxed = Seq(expr("try_cast(details.seller_muxed_id AS BIGINT)")
      .as("seller_muxed_id"))
    effects.select(top ++ lp ++ repeated ++ scalars ++ muxed: _*)
  }

  /** Gate projection: liquidity_pool flattened to its scalar leaves +
    * reserve count, repeated fields to counts, and DECIMAL leaves cast to
    * double at the BOUNDARY only — the engine-side processing stays
    * decimal (proving the NUMERIC mapping), but the gate's oracle reader
    * floats decimals, so the comparison is defined over the identical
    * decimal-then-double round-trip on both engines.
    */
  def flattenWideScalar(effects: DataFrame): DataFrame = {
    val wide = flattenWide(effects)
    val keep = wide.columns
      .filterNot(c => repeatedDetailCols.contains(c) || c == "liquidity_pool")
    def cnt(n: String): Column =
      when(col(n).isNull, lit(null)).otherwise(size(col(n))).cast("long").as(s"n_$n")
    def scalarOut(n: String): Column =
      if (wide.schema(n).dataType.isInstanceOf[DecimalType])
        col(n).cast("double").as(n)
      else col(n)
    wide.select(
      keep.map(scalarOut).toSeq ++ Seq(
        col("liquidity_pool.fee_bp").as("lp_fee_bp"),
        col("liquidity_pool.id").as("lp_id"),
        col("liquidity_pool.total_shares").cast("double").as("lp_total_shares"),
        col("liquidity_pool.total_trustlines").as("lp_total_trustlines"),
        col("liquidity_pool.type").as("lp_type"),
        cnt("liquidity_pool.reserves").as("n_lp_reserves")) ++
        repeatedDetailCols.map(cnt): _*)
  }

  // ---- deterministic fixture from the events table -----------------------

  private val d389 = "DECIMAL(38,9)"

  /** Sparse details payload per event: every DECIMAL and BOOL leaf is
    * populated (an all-null decimal/boolean column reads back with a
    * different null REPRESENTATION per engine — a non-value mismatch the
    * gate can't distinguish); strings/ints stay mostly null like real
    * effects rows.
    */
  private def detailsJsonCol: Column = to_json(struct(
    struct(
      lit(30L).as("fee_bp"),
      concat(lit("lp_"), col("user_id") % 5).as("id"),
      lit("0.5").cast(dec).as("total_shares"),
      (col("user_id") % 50).as("total_trustlines"),
      lit("constant_product").as("type")).as("liquidity_pool"),
    when(col("event_type") === "purchase",
      array(
        struct(lit("A1").as("asset"), col("value").cast(dec).as("amount")),
        struct(lit("A2").as("asset"), (col("value") * 2).cast(dec).as("amount"))))
      .as("reserves_deposited"),
    array(struct(concat(lit("B:"), col("event_type")).as("asset"),
      col("value").cast(dec).as("amount"))).as("bought"),
    array(struct(concat(lit("S:"), col("event_type")).as("asset"),
      (col("value") * 3).cast(dec).as("amount"))).as("sold"),
    (col("value") + 1).cast(dec).as("shares_revoked"),
    when(col("value").isNotNull, col("value") / 2).otherwise(lit(0.0))
      .cast(dec).as("shares_received"),
    (col("value") + 2).cast(dec).as("shares_redeemed"),
    (col("value") * 10).cast(dec).as("limit"),
    (col("user_id") % 2 === 0).as("authorized_flag"),
    (col("user_id") % 3 === 0).as("auth_immutable_flag"),
    (col("user_id") % 5 === 0).as("authorized_to_maintain_liabilites"),
    (col("user_id") % 7 === 0).as("auth_revocable_flag"),
    (col("user_id") % 11 === 0).as("auth_required_flag"),
    (col("user_id") % 13 === 0).as("auth_clawback_enabled_flag"),
    (col("user_id") % 17 === 0).as("claimable_balance_clawback_enabled_flag"),
    (col("user_id") % 19 === 0).as("clawback_enabled_flag"),
    (col("user_id") % 4).as("high_threshold"),
    (col("user_id") % 3).as("med_threshold"),
    (col("user_id") % 2).as("low_threshold"),
    concat(lit("dom_"), col("user_id") % 10).as("home_domain"),
    col("event_type").as("asset_code"),
    (col("event_id") % 1000).as("new_seq"),
    (col("user_id") % 256).as("weight"),
    col("event_id").as("offer_id"),
    col("value").cast(dec).as("amount"),
    (col("value") * 3).cast(dec).as("starting_balance"),
    (col("value") * 4).cast(dec).as("sold_amount"),
    (col("value") * 5).cast(dec).as("bought_amount"),
    (col("user_id") * 7).cast("string").as("seller_muxed_id"),
    when(col("user_id") % 4 === 0, array(lit("e1"), lit("e2")))
      .otherwise(array(lit("e1"))).as("entries")))

  def syntheticEffects(events: DataFrame): DataFrame =
    events
      .withColumn("details_json", detailsJsonCol)
      .select(
        concat(lit("acct_"), col("user_id")).as("address"),
        lit(null).cast(StringType).as("address_muxed"),
        (col("event_id") * 100).as("operation_id"),
        (col("user_id") % 90).as("type"),
        col("event_type").as("type_string"),
        from_json(col("details_json"), detailsSchema).as("details"),
        col("ts").as("closed_at"),
        expr("event_id DIV 100").as("ledger_sequence"),
        (col("event_id") % 20).as("index"),
        concat(lit("ef_"), col("event_id")).as("id"))

  // ---- DuckDB oracle ------------------------------------------------------

  private val duckTypes: Map[String, String] = Map(
    "shares_revoked" -> d389, "shares_received" -> d389, "shares_redeemed" -> d389,
    "new_seq" -> "BIGINT", "limit" -> d389,
    "authorized_flag" -> "BOOLEAN", "auth_immutable_flag" -> "BOOLEAN",
    "authorized_to_maintain_liabilites" -> "BOOLEAN",
    "auth_revocable_flag" -> "BOOLEAN", "auth_required_flag" -> "BOOLEAN",
    "auth_clawback_enabled_flag" -> "BOOLEAN",
    "claimable_balance_clawback_enabled_flag" -> "BOOLEAN",
    "clawback_enabled_flag" -> "BOOLEAN",
    "high_threshold" -> "BIGINT", "med_threshold" -> "BIGINT",
    "low_threshold" -> "BIGINT", "weight" -> "BIGINT",
    "amount" -> d389, "starting_balance" -> d389, "offer_id" -> "BIGINT",
    "sold_amount" -> d389, "bought_amount" -> d389, "extend_to" -> "BIGINT")

  private val duckPopulated: Map[String, String] = Map(
    "shares_revoked" -> s"CAST(value + 1 AS $d389)",
    "shares_received" -> s"CAST(coalesce(value / 2, 0.0) AS $d389)",
    "shares_redeemed" -> s"CAST(value + 2 AS $d389)",
    "new_seq" -> "event_id % 1000",
    "limit" -> s"CAST(value * 10 AS $d389)",
    "authorized_flag" -> "(user_id % 2 = 0)",
    "auth_immutable_flag" -> "(user_id % 3 = 0)",
    "authorized_to_maintain_liabilites" -> "(user_id % 5 = 0)",
    "auth_revocable_flag" -> "(user_id % 7 = 0)",
    "auth_required_flag" -> "(user_id % 11 = 0)",
    "auth_clawback_enabled_flag" -> "(user_id % 13 = 0)",
    "claimable_balance_clawback_enabled_flag" -> "(user_id % 17 = 0)",
    "clawback_enabled_flag" -> "(user_id % 19 = 0)",
    "high_threshold" -> "user_id % 4",
    "med_threshold" -> "user_id % 3",
    "low_threshold" -> "user_id % 2",
    "home_domain" -> "'dom_' || CAST(user_id % 10 AS VARCHAR)",
    "asset_code" -> "event_type",
    "weight" -> "user_id % 256",
    "offer_id" -> "event_id",
    "amount" -> s"CAST(value AS $d389)",
    "starting_balance" -> s"CAST(value * 3 AS $d389)",
    "sold_amount" -> s"CAST(value * 4 AS $d389)",
    "bought_amount" -> s"CAST(value * 5 AS $d389)")

  private def q(n: String) = "\"" + n + "\""

  def wideOracleSql: String = {
    val top = Seq(
      "'acct_' || CAST(user_id AS VARCHAR) AS address",
      "CAST(NULL AS VARCHAR) AS address_muxed",
      "event_id * 100 AS operation_id",
      "user_id % 90 AS " + q("type"),
      "event_type AS type_string",
      "ts AS closed_at",
      "event_id // 100 AS ledger_sequence",
      "event_id % 20 AS " + q("index"),
      "'ef_' || CAST(event_id AS VARCHAR) AS id")
    val scalars = scalarDetailCols.map { n =>
      val t = duckTypes.getOrElse(n, "VARCHAR")
      duckPopulated.get(n) match {
        case Some(e) if t == d389 => s"CAST($e AS DOUBLE) AS ${q(n)}"
        case Some(e)              => s"$e AS ${q(n)}"
        case None if t == d389    => s"CAST(NULL AS DOUBLE) AS ${q(n)}"
        case None                 => s"CAST(NULL AS $t) AS ${q(n)}"
      }
    }
    val muxed = Seq("user_id * 7 AS seller_muxed_id")
    val lp = Seq(
      "CAST(30 AS BIGINT) AS lp_fee_bp",
      "'lp_' || CAST(user_id % 5 AS VARCHAR) AS lp_id",
      s"CAST(CAST(0.5 AS $d389) AS DOUBLE) AS lp_total_shares",
      "user_id % 50 AS lp_total_trustlines",
      "'constant_product' AS lp_type",
      "CAST(NULL AS BIGINT) AS n_lp_reserves")
    val counts = Seq(
      "CAST(NULL AS BIGINT) AS n_reserves_received",
      "CAST(CASE WHEN event_type = 'purchase' THEN 2 END AS BIGINT) AS n_reserves_deposited",
      "CAST(NULL AS BIGINT) AS n_reserves_revoked",
      "CAST(1 AS BIGINT) AS n_bought",
      "CAST(1 AS BIGINT) AS n_sold",
      "CAST(CASE WHEN user_id % 4 = 0 THEN 2 ELSE 1 END AS BIGINT) AS n_entries")
    (top ++ scalars ++ muxed ++ lp ++ counts)
      .mkString("SELECT\n  ", ",\n  ", "\nFROM events")
  }
}
