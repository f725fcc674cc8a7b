package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions._

/** SparkSessionExtensions entry point: registers the graft vector
  * expressions as SQL functions for any session built with
  * `.withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.GraftExtensions`.
  *
  * This is the public, config-only integration path; programmatic users can
  * also call `graft.functions.vector.registerSql(spark)` on an existing
  * session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo("graft", null, name, usage, "", "", "", "", "", "", "built-in")

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((FunctionIdentifier("graft_dot"),
      info("graft_dot", "graft_dot(a, b) - float64 dot product of two vectors"),
      (es: Seq[Expression]) => DotProduct(es(0), es(1))))
    e.injectFunction((FunctionIdentifier("graft_cosine"),
      info("graft_cosine", "graft_cosine(a, b) - cosine similarity, 0.0 on zero magnitude"),
      (es: Seq[Expression]) => CosineSimilarity(es(0), es(1))))
    e.injectFunction((FunctionIdentifier("graft_jaccard"),
      info("graft_jaccard", "graft_jaccard(a, b) - weighted Jaccard score"),
      (es: Seq[Expression]) => WeightedJaccard(es(0), es(1))))
    e.injectFunction((FunctionIdentifier("graft_magnitude"),
      info("graft_magnitude", "graft_magnitude(a) - L2 norm"),
      (es: Seq[Expression]) => VectorMagnitude(es.head)))
    e.injectFunction((FunctionIdentifier("graft_minhash_signature"),
      info("graft_minhash_signature",
        "graft_minhash_signature(pairs, k) - k-member MinHash signature " +
          "over array<struct<h1:long,h2:long>> hashed shingles"),
      (es: Seq[Expression]) => MinhashSignature(es(0), vector.minhashK(es))))
    e.injectFunction((FunctionIdentifier("graft_kgram_hashes60"),
      info("graft_kgram_hashes60",
        "graft_kgram_hashes60(text, k) - positional 60-bit hashes of every " +
          "k-char gram (one md5 pass; feeds winnowing/CDC)"),
      (es: Seq[Expression]) =>
        KgramHashes60(es(0), vector.literalInt(es, 2, "graft_kgram_hashes60"))))
    e.injectFunction((FunctionIdentifier("graft_winnow_mins"),
      info("graft_winnow_mins",
        "graft_winnow_mins(hashes, w) - winnowed fingerprints: dedup'd " +
          "w-window sliding minima of a long array (SIGMOD'03 winnowing)"),
      (es: Seq[Expression]) =>
        WinnowMins(es(0), vector.literalInt(es, 2, "graft_winnow_mins"))))
    e.injectFunction((FunctionIdentifier("graft_char_entropy"),
      info("graft_char_entropy",
        "graft_char_entropy(text) - Shannon entropy (nats) of the " +
          "character distribution; one-pass compression-ratio proxy"),
      (es: Seq[Expression]) => CharEntropy(es.head)))
    e.injectFunction((FunctionIdentifier("graft_nfc"),
      info("graft_nfc",
        "graft_nfc(text) - Unicode NFC canonical composition; " +
          "allocation-free fast path for already-canonical input"),
      (es: Seq[Expression]) => NfcNormalize(es.head)))
    e.injectFunction((FunctionIdentifier("graft_chargram_pairs48"),
      info("graft_chargram_pairs48",
        "graft_chargram_pairs48(text, n) - distinct char n-gram (h1, h2) " +
          "48-bit hash pairs (one pass; feeds MinHash banding)"),
      (es: Seq[Expression]) =>
        CharGramPairs48(es(0),
          vector.literalInt(es, 2, "graft_chargram_pairs48"))))
    e.injectFunction((FunctionIdentifier("graft_wordgram_pairs48"),
      info("graft_wordgram_pairs48",
        "graft_wordgram_pairs48(text, n) - distinct word n-gram (h1, h2) " +
          "48-bit hash pairs (one string walk; feeds word-MinHash banding " +
          "and the n-gram novelty audit)"),
      (es: Seq[Expression]) =>
        WordGramPairs48(es(0),
          vector.literalInt(es, 2, "graft_wordgram_pairs48"))))
    // Keep this list in lockstep with vector.registerSql (the session-
    // level registration): both surfaces must expose the same names.
    e.injectFunction((FunctionIdentifier("graft_sign_pack"),
      info("graft_sign_pack",
        "graft_sign_pack(vec[, wordBits]) - sign bits of a float vector " +
          "packed wordBits (default 32) per long (the 1-bit signature)"),
      (es: Seq[Expression]) => {
        require(es.nonEmpty && es.length <= 2,
          s"graft_sign_pack(vec[, wordBits]) takes 1-2 arguments, got ${es.length}")
        val bits = if (es.length == 1) 32
          else vector.literalInt(es, 2, "graft_sign_pack")
        SignPack(es(0), bits)
      }))
    e.injectFunction((FunctionIdentifier("graft_hamming"),
      info("graft_hamming",
        "graft_hamming(a, b) - Hamming distance between two packed " +
          "sign-bit signatures (xor + popcount per word)"),
      (es: Seq[Expression]) => HammingWords(es(0), es(1))))
  }
}
