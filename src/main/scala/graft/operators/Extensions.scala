package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoder}
import org.apache.spark.sql.functions._

/**
 * Pluggable extension points — broker entry filters (F12), client
 * interceptors (F17), and the message payload processor (F18).
 *
 * Reference: EntryFilter decides ACCEPT/REJECT per entry at dispatch
 * (pulsar-broker/.../service/plugin/EntryFilter.java); interceptors hook
 * before-send / before-consume (ProducerInterceptor.java,
 * ConsumerInterceptor.java); MessagePayloadProcessor converts one stored
 * payload into N client messages (MessagePayloadProcessor.java). All
 * three are composition points — declarative predicates and transforms —
 * so Catalyst fuses them into the scan.
 */
object Extensions {

  /** F12 — an entry-filter chain: every filter must ACCEPT (AND of
   * predicates), applied at dispatch like the broker's filter list. */
  def entryFilters(env: DataFrame, filters: Seq[Column]): DataFrame =
    filters.foldLeft(env)((df, f) => df.filter(f))

  /** F17 — interceptor chain: beforeSend/beforeConsume rewrite hooks as
   * composed DataFrame transforms. */
  def intercept(env: DataFrame, hooks: Seq[DataFrame => DataFrame]): DataFrame =
    hooks.foldLeft(env)((df, h) => df.transform(h))

  /** F18 — payload processor: one stored message expands to N decoded
   * client messages. */
  def processPayload[T: Encoder](env: Dataset[graft.model.MessageEnvelope],
      convert: graft.model.MessageEnvelope => Seq[T]): Dataset[T] =
    env.flatMap(convert)
}
