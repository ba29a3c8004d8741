package graft.artifact

import java.io.{ByteArrayOutputStream, DataOutputStream}
import java.nio.{ByteBuffer, ByteOrder}
import graft.model.Payload

/**
 * Runtime artifacts — vocabulary, payload records, manifest — re-expressed from
 * the reference's build outputs (ext/phrasekit/src/bin/phrasekit_build.rs:137-185).
 *
 * The daachorse automaton file (`phrases.daac`) is replaced by our broadcast
 * token-level trie (graft.matching.AhoCorasick); `payloads.bin` and `vocab.json`
 * layouts are reproduced byte-/field-exactly so the fixture-parity suite can diff
 * against the committed reference artifacts.
 */

/** Vocabulary: unique lowercased tokens sorted alphabetically, IDs 1..n, <UNK>=0
 * (phrasekit_build.rs:306-326, docs/VOCABULARY.md:9-39). */
final case class Vocab(tokens: Map[String, Int], separatorId: Long) extends Serializable {
  val unkId: Int = 0
  def vocabSize: Int = tokens.size + 1 // + <UNK>
  /** Encode one surface token: lowercase, then lookup, <UNK>=0 for misses
   * (phrasekit_tag.rs:74-84, lib/phrasekit.rb:43-51). */
  @inline def encode(token: String): Int =
    tokens.getOrElse(token.toLowerCase(java.util.Locale.ROOT), unkId)
  def encodeAll(ts: Seq[String]): Array[Int] = {
    val out = new Array[Int](ts.length)
    var i = 0
    ts.foreach { t => out(i) = encode(t); i += 1 }
    out
  }
}

object Vocab {
  /** Reference separator constant u32::MAX - 1 (docs/BUILDER.md:30). Exceeds
   * Int.MaxValue, held as Long. */
  val SeparatorId: Long = 4294967294L

  /** Alphabetical ID assignment over a unique lowercased token set
   * (phrasekit_build.rs:306-326). Sort is by UTF-16 code unit (Java String
   * ordering); identical to Rust's byte sort for all ASCII/BMP data. */
  def fromTokens(unique: Iterable[String]): Vocab = {
    val sorted = unique.toArray.sorted
    Vocab(sorted.zipWithIndex.map { case (t, i) => t -> (i + 1) }.toMap, SeparatorId)
  }

  /** Canonical vocab.json body (field set per the reference artifact). */
  def toJson(v: Vocab): String = {
    val toks = v.tokens.toSeq.sortBy(_._2)
      .map { case (t, id) => s"${jstr(t)}: $id" }.mkString("{", ", ", "}")
    s"""{"tokens": $toks, "special_tokens": {"<UNK>": 0}, "vocab_size": ${v.vocabSize}, "separator_id": ${v.separatorId}}"""
  }

  private def jstr(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
}

object PayloadIO {
  /** 17-byte LE record: phrase_id u32, salience f32, count u32, pad 4B, n u8
   * (ext/phrasekit/src/payload.rs:27-53). */
  val RecordBytes = 17

  def write(payloads: Seq[Payload]): Array[Byte] = {
    val bos = new ByteArrayOutputStream(payloads.length * RecordBytes)
    val out = new DataOutputStream(bos)
    payloads.foreach { p =>
      val bb = ByteBuffer.allocate(RecordBytes).order(ByteOrder.LITTLE_ENDIAN)
      bb.putInt(p.phraseId)
      bb.putFloat(p.salience)
      bb.putInt(p.count)
      bb.putInt(0) // pad
      bb.put(p.n)
      out.write(bb.array())
    }
    out.flush()
    bos.toByteArray
  }

  def read(bytes: Array[Byte]): Array[Payload] = {
    require(bytes.length % RecordBytes == 0, s"truncated payloads: ${bytes.length} bytes")
    val n = bytes.length / RecordBytes
    val out = new Array[Payload](n)
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    var i = 0
    while (i < n) {
      val phraseId = bb.getInt
      val salience = bb.getFloat
      val count = bb.getInt
      bb.getInt // pad
      val nn = bb.get
      out(i) = Payload(phraseId, salience, count, nn)
      i += 1
    }
    out
  }
}

/** Build/runtime manifest (ext/phrasekit/src/manifest.rs:7-16) with the reference's
 * load-time invariants (manifest.rs:36-41; matcher.rs:51-57). */
final case class Manifest(
    version: String,
    tokenizer: String,
    numPatterns: Int,
    minCount: Option[Long],
    salienceThreshold: Option[Double],
    builtAt: String,
    separatorId: Long) {
  require(separatorId != 0, "Invalid separator_id: must not be 0")
}

object Manifest {
  def toJson(m: Manifest): String = {
    def opt[T](o: Option[T]): String = o.map(_.toString).getOrElse("null")
    s"""{"version": "${m.version}", "tokenizer": "${m.tokenizer}", "num_patterns": ${m.numPatterns}, "min_count": ${opt(m.minCount)}, "salience_threshold": ${opt(m.salienceThreshold)}, "built_at": "${m.builtAt}", "separator_id": ${m.separatorId}}"""
  }
}
