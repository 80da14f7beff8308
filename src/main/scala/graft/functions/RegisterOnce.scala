package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.Expression

/** Session-idempotent native-function registration (VERDICT r19 item 5).
  *
  * `createOrReplaceTempFunction` logs a SimpleFunctionRegistry WARN on
  * every re-registration, and the per-entry `register()` helpers run once
  * per query EXECUTION — a full Bench sweep's stderr was thousands of
  * "replaced a previously registered function" lines, which displaced the
  * one JSON line the driver records from its 2000-char output tail
  * (BENCH_r19's entire tail was this spam). Registering only when the
  * name is absent from THIS session's registry silences the spam and
  * skips the redundant registry churn.
  *
  * Only for pure, session-independent builders (every graft.functions
  * expression qualifies — the builder closes over nothing but the call's
  * children). Data-dependent registrations (e.g. ScaleOps's
  * `bloom_might_contain`, whose builder closes over freshly-built filter
  * bytes) must keep calling createOrReplaceTempFunction directly.
  */
object RegisterOnce {
  def apply(s: SparkSession, name: String)(
      builder: Seq[Expression] => Expression): Unit = {
    val reg = s.sessionState.functionRegistry
    if (!reg.functionExists(FunctionIdentifier(name)))
      reg.createOrReplaceTempFunction(name, builder, "built-in")
  }
}
