package graft.operators

import javax.crypto.Cipher
import javax.crypto.spec.{IvParameterSpec, SecretKeySpec}

/** PDF standard security handler (PDF 32000-1:2008 §7.6.3) for the
  * EMPTY-user-password case — the "encrypted but freely openable"
  * documents crawled corpora are full of (generators that set only an
  * owner password encrypt every stream; a reader opens them without
  * prompting). Pure JDK: MD5/RC4(ARCFOUR)/AES-CBC all ship in
  * java.security / javax.crypto.
  *
  * Supported: /Filter /Standard with V 1/2 (RC4, 40..128-bit) and
  * V 4 crypt filters /V2 (RC4) or /AESV2 (AES-128-CBC, 16-byte IV
  * prefix) — R 2/3/4. NOT handled (documented seam): V 5 / R 6
  * (AES-256, the SHA-2 hardened-hash Algorithm 2.A) and documents with
  * a real (non-empty) user password — both decrypt to garbage, which
  * the caller's never-throws pipeline degrades to empty text.
  *
  * Honesty note (the Mp3Layer3 discipline): no independent encrypted
  * fixture generator exists in this offline container, so the spec
  * tests build their fixtures with an ENCRYPTION-side implementation
  * of the same published algorithms. The transcription
  * self-consistency risk that left is retired as of r14 by
  * `PdfCryptSpec`'s known-answer vectors — file keys, /U values, and
  * per-object keys for R2/R3/R4 pinned to hex computed independently
  * of this code (Python hashlib + from-scratch RC4, Algorithms 1/2/4/5
  * followed literally from the spec text). Defense in depth stays:
  * (a) the decoder VALIDATES the stored /U against [[emptyUserU]]
  * before trusting any key; (b) wrongly-keyed filtered streams cannot
  * inflate. Failure is always CLOSED.
  */
private[operators] object PdfCrypt {

  /** §7.6.3.3 Algorithm 2's 32-byte password pad (printed in the
    * spec; also RFC 3778-adjacent public knowledge). */
  val Pad: Array[Byte] = Array(
    0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41,
    0x64, 0x00, 0x4E, 0x56, 0xFF, 0xFA, 0x01, 0x08,
    0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
    0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A).map(_.toByte)

  /** aes = the StdCF crypt method is AESV2; keyBytes = /Length in
    * bytes (5 when R = 2). */
  final case class Ctx(fileKey: Array[Byte], aes: Boolean)

  private def md5(parts: Array[Byte]*): Array[Byte] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    parts.foreach(md.update)
    md.digest()
  }

  /** Algorithm 2 with the empty user password: the padded (empty)
    * password, the 32 /O bytes, /P as a 4-byte little-endian SIGNED
    * int, the first file identifier, and — when R >= 4 declares
    * /EncryptMetadata false — four 0xFF bytes (r13 review: omitting
    * that step derives a wrong key for every metadata-unencrypted R4
    * document); R >= 3 re-hashes the first keyBytes 50 times. */
  def fileKey(o: Array[Byte], p: Int, fileId: Array[Byte],
      r: Int, keyBytes: Int, encryptMetadata: Boolean = true): Array[Byte] = {
    val pLe = Array[Byte](
      (p & 0xff).toByte, ((p >> 8) & 0xff).toByte,
      ((p >> 16) & 0xff).toByte, ((p >> 24) & 0xff).toByte)
    val metaTail =
      if (r >= 4 && !encryptMetadata)
        Array[Byte](-1, -1, -1, -1)
      else Array.emptyByteArray
    var h = md5(Pad, o.take(32), pLe, fileId, metaTail)
    if (r >= 3)
      for (_ <- 0 until 50) h = md5(h.take(keyBytes))
    h.take(keyBytes)
  }

  private def rc4(key: Array[Byte], data: Array[Byte]): Array[Byte] = {
    val c = Cipher.getInstance("ARCFOUR")
    c.init(Cipher.ENCRYPT_MODE, new SecretKeySpec(key, "ARCFOUR"))
    c.doFinal(data)
  }

  /** Algorithm 4 (R = 2) / Algorithm 5 (R >= 3): the /U value the
    * EMPTY user password produces under `fileKey`. The decoder
    * compares this against the stored /U — a mismatch means the
    * document has a REAL user password (or we mis-derived the key) and
    * extraction must fail closed BEFORE any ciphertext could flow
    * through an unfiltered stream as fake text (r13 review). */
  def emptyUserU(fileKey: Array[Byte], fileId: Array[Byte], r: Int): Array[Byte] =
    if (r == 2) rc4(fileKey, Pad)
    else {
      var u = rc4(fileKey, md5(Pad, fileId))
      for (i <- 1 to 19)
        u = rc4(fileKey.map(b => (b ^ i).toByte), u)
      u // 16 bytes; the stored /U's tail 16 are arbitrary padding
    }

  /** True when the stored /U proves the empty user password opens the
    * document under this key. */
  def checkEmptyUser(fileKey: Array[Byte], fileId: Array[Byte], r: Int,
      uStored: Array[Byte]): Boolean =
    try {
      val want = emptyUserU(fileKey, fileId, r)
      val n = if (r == 2) 32 else 16
      uStored.length >= n &&
        java.util.Arrays.equals(want.take(n), uStored.take(n))
    } catch { case _: Exception => false }

  private val AesSalt = Array[Byte](0x73, 0x41, 0x6C, 0x54) // "sAlT"

  /** Algorithm 1's per-object key: MD5(fileKey ++ objNum LE24 ++
    * gen LE16 [++ sAlT for AES]), truncated to min(n+5, 16). */
  def objKey(ctx: Ctx, num: Int, gen: Int): Array[Byte] = {
    val tail = Array[Byte](
      (num & 0xff).toByte, ((num >> 8) & 0xff).toByte,
      ((num >> 16) & 0xff).toByte,
      (gen & 0xff).toByte, ((gen >> 8) & 0xff).toByte)
    val h =
      if (ctx.aes) md5(ctx.fileKey, tail, AesSalt)
      else md5(ctx.fileKey, tail)
    h.take(math.min(ctx.fileKey.length + 5, 16))
  }

  /** Decrypt one stream's bytes. AESV2 payloads carry a 16-byte IV
    * prefix and PKCS#5-style block padding; RC4 is a plain keystream.
    * Any failure → empty (fail closed). */
  def decrypt(ctx: Ctx, num: Int, gen: Int, data: Array[Byte]): Array[Byte] =
    try {
      val key = objKey(ctx, num, gen)
      if (ctx.aes) {
        if (data.length < 32 || data.length % 16 != 0) return Array.emptyByteArray
        val c = Cipher.getInstance("AES/CBC/PKCS5Padding")
        c.init(Cipher.DECRYPT_MODE, new SecretKeySpec(key, "AES"),
          new IvParameterSpec(data.take(16)))
        c.doFinal(data, 16, data.length - 16)
      } else {
        val c = Cipher.getInstance("ARCFOUR")
        c.init(Cipher.DECRYPT_MODE, new SecretKeySpec(key, "ARCFOUR"))
        c.doFinal(data)
      }
    } catch { case _: Exception => Array.emptyByteArray }

}
