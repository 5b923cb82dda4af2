package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The reference's widest table, re-expressed for Spark: history_operations
  * with its ~230-leaf `details` RECORD (reference
  * schemas/history_operations_schema.json) and the full-width export
  * projection (reference dags/queries/generate_avro/history_operations.sql:9-140,
  * ~120 selected leaves).
  *
  * Three pieces:
  *   - [[detailsSchema]] / [[schema]]: a Scala declaration of the data
  *     model (the WHAT — field names, types, modes — mirrored from the
  *     reference schema JSON; the real files parse through
  *     [[SchemaRegistry.fromJson]] and the spec proves the two agree).
  *   - [[flattenWide]]: the export projection — every `details.*` leaf the
  *     reference's avro export selects, in its order, arrays/records
  *     included. Catalyst's nested-schema pruning means a downstream
  *     consumer reading 3 of the 120 columns still scans only those leaf
  *     columns of the parquet.
  *   - [[syntheticOps]] + [[wideOracleSql]]: a deterministic
  *     history_operations fixture derived from the `events` table (a
  *     sparse `details_json` string parsed through the FULL schema with
  *     from_json — most leaves null, exactly like real operations where
  *     each op type populates its own slice), and the DuckDB SQL that
  *     re-derives the flattened result for the driver's hash gate.
  */
object HistoryOperations {

  private def f(n: String, t: DataType) = StructField(n, t)
  private def arr(t: DataType) = ArrayType(t, containsNull = true)

  private val priceR = StructType(Seq(f("d", LongType), f("n", LongType)))
  private val pathT = StructType(Seq(
    f("asset_code", StringType), f("asset_issuer", StringType), f("asset_type", StringType)))
  private val balanceChange = StructType(Seq(
    f("amount", DoubleType), f("asset_code", StringType), f("asset_issuer", StringType),
    f("asset_type", StringType), f("from", StringType), f("to", StringType),
    f("type", StringType)))
  private val param = StructType(Seq(f("type", StringType), f("value", StringType)))
  // the claimant predicate is a recursive and/or/not tree in the reference;
  // the fixture schema carries one level (the spec parses the real
  // arbitrarily-nested file through SchemaRegistry to prove the general case)
  private val predicateLeaf = StructType(Seq(
    f("unconditional", BooleanType), f("abs_before", StringType),
    f("rel_before", LongType), f("abs_before_epoch", LongType)))
  private val claimant = StructType(Seq(
    f("destination", StringType), f("predicate", arr(predicateLeaf))))

  /** (name, type) in the reference schema's field order; REPEATED fields
    * carry ArrayType. reference schemas/history_operations_schema.json `details`.
    */
  val detailsSchema: StructType = StructType(Seq(
    f("account", StringType), f("account_muxed", StringType),
    f("account_muxed_id", StringType), f("account_id", StringType),
    f("amount", DoubleType), f("asset", StringType), f("asset_code", StringType),
    f("asset_issuer", StringType), f("asset_id", LongType), f("asset_type", StringType),
    f("authorize", BooleanType), f("balance_id", StringType),
    f("balance_id_strkey", StringType), f("buying_asset_code", StringType),
    f("buying_asset_issuer", StringType), f("buying_asset_id", LongType),
    f("buying_asset_type", StringType), f("claimable_balance_id", StringType),
    f("claimable_balance_id_strkey", StringType), f("claimant", StringType),
    f("claimant_muxed", StringType), f("claimant_muxed_id", StringType),
    f("claimants", arr(claimant)), f("data_account_id", StringType),
    f("data_name", StringType), f("from", StringType), f("from_muxed", StringType),
    f("from_muxed_id", StringType), f("funder", StringType),
    f("funder_muxed", StringType), f("funder_muxed_id", StringType),
    f("high_threshold", LongType), f("home_domain", StringType),
    f("inflation_dest", StringType), f("into", StringType),
    f("into_muxed", StringType), f("into_muxed_id", StringType),
    f("limit", DoubleType), f("low_threshold", LongType),
    f("master_key_weight", LongType), f("med_threshold", LongType),
    f("name", StringType), f("offer_id", LongType), f("path", arr(pathT)),
    f("price", DoubleType), f("price_r", priceR),
    f("selling_asset_code", StringType), f("selling_asset_issuer", StringType),
    f("selling_asset_id", LongType), f("selling_asset_type", StringType),
    f("set_flags", arr(LongType)), f("set_flags_s", arr(StringType)),
    f("signer_account_id", StringType), f("signer_key", StringType),
    f("signer_weight", LongType), f("source_amount", DoubleType),
    f("source_asset_code", StringType), f("source_asset_issuer", StringType),
    f("source_asset_id", LongType), f("source_asset_type", StringType),
    f("source_max", DoubleType), f("starting_balance", DoubleType),
    f("to", StringType), f("to_muxed", StringType), f("to_muxed_id", StringType),
    f("trustee", StringType), f("trustee_muxed", StringType),
    f("trustee_muxed_id", StringType), f("trustline_account_id", StringType),
    f("trustline_asset", StringType), f("trustor", StringType),
    f("trustor_muxed", StringType), f("trustor_muxed_id", StringType),
    f("value", StringType), f("clear_flags", arr(LongType)),
    f("clear_flags_s", arr(StringType)), f("destination_min", StringType),
    f("bump_to", StringType), f("authorize_to_maintain_liabilities", BooleanType),
    f("clawback_enabled", BooleanType), f("sponsor", StringType),
    f("sponsored_id", StringType), f("begin_sponsor", StringType),
    f("begin_sponsor_muxed", StringType), f("begin_sponsor_muxed_id", StringType),
    f("liquidity_pool_id", StringType), f("liquidity_pool_id_strkey", StringType),
    f("reserve_a_asset_type", StringType), f("reserve_a_asset_code", StringType),
    f("reserve_a_asset_issuer", StringType), f("reserve_a_asset_id", LongType),
    f("reserve_a_max_amount", DoubleType), f("reserve_a_deposit_amount", DoubleType),
    f("reserve_b_asset_type", StringType), f("reserve_b_asset_code", StringType),
    f("reserve_b_asset_issuer", StringType), f("reserve_b_asset_id", LongType),
    f("reserve_b_max_amount", DoubleType), f("reserve_b_deposit_amount", DoubleType),
    f("min_price", DoubleType), f("min_price_r", arr(priceR)),
    f("max_price", DoubleType), f("max_price_r", arr(priceR)),
    f("shares_received", DoubleType), f("reserve_a_min_amount", DoubleType),
    f("reserve_a_withdraw_amount", DoubleType), f("reserve_b_min_amount", DoubleType),
    f("reserve_b_withdraw_amount", DoubleType), f("shares", DoubleType),
    f("asset_balance_changes", arr(balanceChange)), f("parameters", arr(param)),
    f("parameters_decoded", arr(param)), f("function", StringType),
    f("address", StringType), f("type", StringType), f("extend_to", LongType),
    f("contract_id", StringType), f("contract_code_hash", StringType),
    // NOTE the export SQL (generate_avro/history_operations.sql:139) also
    // selects details.ledgers_to_expire, but the schema JSON — the load
    // contract — does not carry it; the schema file wins here
    f("ledger_key_hash", arr(StringType)), f("parameters_json", StringType),
    f("parameters_json_decoded", StringType)))

  /** Full table schema (reference schemas/history_operations_schema.json top level). */
  val schema: StructType = StructType(Seq(
    f("details", detailsSchema), f("id", LongType), f("source_account", StringType),
    f("source_account_muxed", StringType), f("transaction_id", LongType),
    f("type", LongType), f("type_string", StringType), f("batch_id", StringType),
    f("batch_run_date", TimestampNTZType), f("batch_insert_ts", TimestampType),
    f("closed_at", TimestampType), f("operation_result_code", StringType),
    f("operation_trace_code", StringType), f("ledger_sequence", LongType),
    f("details_json", StringType)))

  /** The scalar `details.*` leaves the avro export selects, in its order
    * (reference dags/queries/generate_avro/history_operations.sql:19-139;
    * `details.type` is aliased soroban_operation_type there and here).
    */
  val scalarDetailCols: Seq[String] = Seq(
    "account", "account_muxed", "account_muxed_id", "account_id", "amount",
    "asset", "asset_code", "asset_issuer", "asset_id", "asset_type",
    "authorize", "balance_id", "balance_id_strkey", "buying_asset_code",
    "buying_asset_issuer", "buying_asset_id", "buying_asset_type",
    "claimable_balance_id", "claimable_balance_id_strkey", "claimant",
    "claimant_muxed", "claimant_muxed_id", "data_account_id", "data_name",
    "from", "from_muxed", "from_muxed_id", "funder", "funder_muxed",
    "funder_muxed_id", "high_threshold", "home_domain", "inflation_dest",
    "into", "into_muxed", "into_muxed_id", "limit", "low_threshold",
    "master_key_weight", "med_threshold", "name", "offer_id", "price",
    "selling_asset_code", "selling_asset_issuer", "selling_asset_id",
    "selling_asset_type", "signer_account_id", "signer_key", "signer_weight",
    "source_amount", "source_asset_code", "source_asset_issuer",
    "source_asset_id", "source_asset_type", "source_max", "starting_balance",
    "to", "to_muxed", "to_muxed_id", "trustee", "trustee_muxed",
    "trustee_muxed_id", "trustline_account_id", "trustline_asset", "trustor",
    "trustor_muxed", "trustor_muxed_id", "value", "destination_min",
    "bump_to", "authorize_to_maintain_liabilities", "clawback_enabled",
    "sponsor", "sponsored_id", "begin_sponsor", "begin_sponsor_muxed",
    "begin_sponsor_muxed_id", "liquidity_pool_id", "liquidity_pool_id_strkey",
    "reserve_a_asset_type", "reserve_a_asset_code", "reserve_a_asset_issuer",
    "reserve_a_asset_id", "reserve_a_max_amount", "reserve_a_deposit_amount",
    "reserve_b_asset_type", "reserve_b_asset_code", "reserve_b_asset_issuer",
    "reserve_b_asset_id", "reserve_b_max_amount", "reserve_b_deposit_amount",
    "min_price", "max_price", "shares_received", "reserve_a_min_amount",
    "reserve_a_withdraw_amount", "reserve_b_min_amount",
    "reserve_b_withdraw_amount", "shares", "function", "address",
    "extend_to", "contract_id", "contract_code_hash", "parameters_json",
    "parameters_json_decoded")

  /** The REPEATED `details.*` fields the export selects (arrays pass
    * through raw here; the gate query reduces them to counts because the
    * cross-engine hash compare is defined over scalar columns).
    */
  val repeatedDetailCols: Seq[String] = Seq(
    "path", "set_flags", "set_flags_s", "clear_flags", "clear_flags_s",
    "min_price_r", "max_price_r", "asset_balance_changes", "parameters",
    "parameters_decoded", "ledger_key_hash")

  /** The export projection: top-level columns + every selected details
    * leaf, reference order, arrays and the price_r record included.
    */
  def flattenWide(ops: DataFrame): DataFrame = {
    val top = Seq("id", "source_account", "source_account_muxed",
      "transaction_id", "type", "type_string", "closed_at",
      "operation_result_code", "operation_trace_code", "ledger_sequence")
      .map(col)
    val scalars = scalarDetailCols.map(n => col(s"details.`$n`").as(n))
    val soroban = col("details.`type`").as("soroban_operation_type")
    val repeated = repeatedDetailCols.map(n => col(s"details.`$n`").as(n))
    val priceRec = Seq(col("details.price_r").as("price_r"))
    ops.select(top ++ scalars ++ Seq(soroban) ++ priceRec ++ repeated: _*)
  }

  // ---- deterministic fixture from the events table -----------------------

  /** Sparse details payload per event: ~15 populated leaves spanning every
    * kind (string/double/long/bool, a record, long/string/record arrays),
    * the other ~100 absent -> null through the full-width from_json, the
    * same shape real operations have (each op type fills its own slice).
    */
  private def detailsJsonCol: Column = to_json(struct(
    concat(lit("acct_"), col("user_id")).as("account"),
    col("value").as("amount"),
    col("event_type").as("asset_code"),
    (col("user_id") % 2 === 0).as("authorize"),
    // populate every BOOLEAN leaf: an all-null boolean column reads back
    // as object-None from parquet but NaN from the oracle engine, a
    // representation (not value) mismatch the hash gate can't tell apart
    (col("user_id") % 5 === 0).as("authorize_to_maintain_liabilities"),
    (col("user_id") % 7 === 0).as("clawback_enabled"),
    (col("user_id") % 4).as("high_threshold"),
    concat(lit("dom_"), col("user_id") % 10).as("home_domain"),
    get_json_object(col("props"), "$.k").as("name"),
    col("event_id").as("offer_id"),
    (col("value") * 2).as("price"),
    struct(lit(100L).as("d"), (col("event_id") % 97).as("n")).as("price_r"),
    when(col("user_id") % 3 === 0,
      array(col("user_id") % 5, col("user_id") % 7))
      .otherwise(array(col("user_id") % 5)).as("set_flags"),
    when(col("user_id") % 3 === 0,
      array(concat(lit("flag_"), col("user_id") % 5),
        concat(lit("flag_"), col("user_id") % 7)))
      .otherwise(array(concat(lit("flag_"), col("user_id") % 5))).as("set_flags_s"),
    array(struct(
      concat(lit("P"), col("user_id") % 3).as("asset_code"),
      lit("issuer_x").as("asset_issuer"),
      lit("credit_alphanum4").as("asset_type"))).as("path"),
    when(col("event_type") === "purchase",
      array(struct(lit("Sym").as("type"),
        col("event_type").as("value")))).as("parameters"),
    when(col("event_type") === "purchase",
      concat(lit("invoke_"), col("event_type"))).as("type")))

  /** events -> history_operations rows: stable top-level mapping + the
    * sparse details_json parsed through the FULL 121-field schema.
    */
  def syntheticOps(events: DataFrame): DataFrame =
    events
      .withColumn("details_json", detailsJsonCol)
      .select(
        from_json(col("details_json"), detailsSchema).as("details"),
        col("event_id").as("id"),
        concat(lit("acct_"), col("user_id")).as("source_account"),
        lit(null).cast(StringType).as("source_account_muxed"),
        (col("event_id") * 10).as("transaction_id"),
        (col("user_id") % 24).as("type"),
        col("event_type").as("type_string"),
        col("ts").as("closed_at"),
        lit("op_success").as("operation_result_code"),
        lit(null).cast(StringType).as("operation_trace_code"),
        expr("event_id DIV 100").as("ledger_sequence"),
        col("details_json"))

  /** The gate projection: [[flattenWide]] with arrays reduced to counts and
    * price_r split into its two leaves — scalar columns only, so the
    * driver's column-sorted hash compare is well defined.
    */
  def flattenWideScalar(ops: DataFrame): DataFrame = {
    val wide = flattenWide(ops)
    val keep = wide.columns.filterNot(c => repeatedDetailCols.contains(c) || c == "price_r")
    def cnt(n: String): Column =
      when(col(n).isNull, lit(null)).otherwise(size(col(n))).cast("long").as(s"n_$n")
    wide.select(
      keep.map(col).toSeq ++
        Seq(col("price_r.n").as("price_r_n"), col("price_r.d").as("price_r_d")) ++
        repeatedDetailCols.map(cnt): _*)
  }

  // ---- DuckDB oracle ------------------------------------------------------

  /** DuckDB type per populated-or-not scalar leaf (defaults VARCHAR). */
  private val duckTypes: Map[String, String] = Map(
    "amount" -> "DOUBLE", "asset_id" -> "BIGINT", "authorize" -> "BOOLEAN",
    "buying_asset_id" -> "BIGINT", "high_threshold" -> "BIGINT",
    "limit" -> "DOUBLE", "low_threshold" -> "BIGINT",
    "master_key_weight" -> "BIGINT", "med_threshold" -> "BIGINT",
    "offer_id" -> "BIGINT", "price" -> "DOUBLE", "selling_asset_id" -> "BIGINT",
    "signer_weight" -> "BIGINT", "source_amount" -> "DOUBLE",
    "source_asset_id" -> "BIGINT", "source_max" -> "DOUBLE",
    "starting_balance" -> "DOUBLE",
    "authorize_to_maintain_liabilities" -> "BOOLEAN",
    "clawback_enabled" -> "BOOLEAN", "reserve_a_asset_id" -> "BIGINT",
    "reserve_a_max_amount" -> "DOUBLE", "reserve_a_deposit_amount" -> "DOUBLE",
    "reserve_b_asset_id" -> "BIGINT", "reserve_b_max_amount" -> "DOUBLE",
    "reserve_b_deposit_amount" -> "DOUBLE", "min_price" -> "DOUBLE",
    "max_price" -> "DOUBLE", "shares_received" -> "DOUBLE",
    "reserve_a_min_amount" -> "DOUBLE", "reserve_a_withdraw_amount" -> "DOUBLE",
    "reserve_b_min_amount" -> "DOUBLE", "reserve_b_withdraw_amount" -> "DOUBLE",
    "shares" -> "DOUBLE", "extend_to" -> "BIGINT")

  /** DuckDB expressions for the populated leaves — the same derivations as
    * [[detailsJsonCol]], computed directly from the events columns (the
    * JSON round-trip is the engine's concern; the oracle defines values).
    */
  private val duckPopulated: Map[String, String] = Map(
    "account" -> "'acct_' || CAST(user_id AS VARCHAR)",
    "amount" -> "value",
    "asset_code" -> "event_type",
    "authorize" -> "(user_id % 2 = 0)",
    "authorize_to_maintain_liabilities" -> "(user_id % 5 = 0)",
    "clawback_enabled" -> "(user_id % 7 = 0)",
    "high_threshold" -> "user_id % 4",
    "home_domain" -> "'dom_' || CAST(user_id % 10 AS VARCHAR)",
    "name" -> "json_extract_string(props, '$.k')",
    "offer_id" -> "event_id",
    "price" -> "value * 2")

  private def q(n: String) = "\"" + n + "\""

  /** The full oracle SQL for the flattened synthetic table over `events`. */
  def wideOracleSql: String = {
    val top = Seq(
      "event_id AS id",
      "'acct_' || CAST(user_id AS VARCHAR) AS source_account",
      "CAST(NULL AS VARCHAR) AS source_account_muxed",
      "event_id * 10 AS transaction_id",
      "user_id % 24 AS " + q("type"),
      "event_type AS type_string",
      "ts AS closed_at",
      "'op_success' AS operation_result_code",
      "CAST(NULL AS VARCHAR) AS operation_trace_code",
      "event_id // 100 AS ledger_sequence")
    val scalars = scalarDetailCols.map { n =>
      duckPopulated.get(n) match {
        case Some(e) => s"$e AS ${q(n)}"
        case None    => s"CAST(NULL AS ${duckTypes.getOrElse(n, "VARCHAR")}) AS ${q(n)}"
      }
    }
    val soroban =
      "CASE WHEN event_type = 'purchase' THEN 'invoke_' || event_type END AS soroban_operation_type"
    val priceRec = Seq(
      "event_id % 97 AS price_r_n",
      "CAST(100 AS BIGINT) AS price_r_d")
    val counts = repeatedDetailCols.map {
      case "path"        => "CAST(1 AS BIGINT) AS n_path"
      case "set_flags"   => "CAST(CASE WHEN user_id % 3 = 0 THEN 2 ELSE 1 END AS BIGINT) AS n_set_flags"
      case "set_flags_s" => "CAST(CASE WHEN user_id % 3 = 0 THEN 2 ELSE 1 END AS BIGINT) AS n_set_flags_s"
      case "parameters"  => "CAST(CASE WHEN event_type = 'purchase' THEN 1 END AS BIGINT) AS n_parameters"
      case n             => s"CAST(NULL AS BIGINT) AS n_$n"
    }
    (top ++ scalars ++ Seq(soroban) ++ priceRec ++ counts)
      .mkString("SELECT\n  ", ",\n  ", "\nFROM events")
  }
}
