package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Known-answer vectors for the standard-security-handler key
  * derivation (r13 VERDICT #2: the encrypted PdfTextSpec fixtures are
  * built by an encryption-side implementation of the SAME published
  * algorithms, so a transcription error could self-validate; these
  * vectors retire that risk). Every expected value below was computed
  * INDEPENDENTLY of this repo's Scala code — Python hashlib.md5 plus a
  * from-scratch RC4, following ISO 32000-1:2008 §7.6.3.3 Algorithm 2
  * (file key), §7.6.3.4 Algorithms 4/5 (/U), and §7.6.2 Algorithm 1
  * (per-object key) literally — and is pinned here as hex. The AES
  * block cipher itself is the JDK's (not re-implemented), so the
  * derivation chain was the only self-consistency exposure.
  *
  * Fixed inputs: /O = bytes (i*11+5 mod 256, i<32), /P = -44,
  * fileId = bytes (i*13+1 mod 256, i<16) — the PdfFixtures values, so
  * a failure here also explains any fixture-test failure.
  */
class PdfCryptSpec extends AnyFunSuite {

  private val o = Array.tabulate[Byte](32)(i => (i * 11 + 5).toByte)
  private val fid = Array.tabulate[Byte](16)(i => (i * 13 + 1).toByte)
  private val p = -44

  private def hex(b: Array[Byte]): String =
    b.map(x => f"${x & 0xff}%02x").mkString

  test("Algorithm 2, R2 / 40-bit: file key") {
    assert(hex(PdfCrypt.fileKey(o, p, fid, r = 2, keyBytes = 5)) ==
      "0a37fc0997")
  }

  test("Algorithm 4 (R2): /U = RC4(key, pad), all 32 bytes") {
    val k = PdfCrypt.fileKey(o, p, fid, r = 2, keyBytes = 5)
    assert(hex(PdfCrypt.emptyUserU(k, fid, r = 2)) ==
      "66a60bb25859ec30feba28dedf5c9740" +
        "bb771693d86902a3a18c9a3bca5f52a8")
  }

  test("Algorithm 2, R3 / 128-bit: the 50-fold MD5 re-hash") {
    assert(hex(PdfCrypt.fileKey(o, p, fid, r = 3, keyBytes = 16)) ==
      "e43f1d386a78905c34f654758cc3c6a1")
  }

  test("Algorithm 5 (R3): first 16 /U bytes under the empty password") {
    val k = PdfCrypt.fileKey(o, p, fid, r = 3, keyBytes = 16)
    assert(hex(PdfCrypt.emptyUserU(k, fid, r = 3).take(16)) ==
      "b435e63b23e56d519799b5f8e24219c8")
  }

  test("Algorithm 1: RC4 per-object key (obj 7 gen 0)") {
    val k = PdfCrypt.fileKey(o, p, fid, r = 3, keyBytes = 16)
    assert(hex(PdfCrypt.objKey(PdfCrypt.Ctx(k, aes = false), 7, 0)) ==
      "080e4e10157d83415adda2aa883999ad")
  }

  test("Algorithm 2, R4 with /EncryptMetadata false: the 0xFFFFFFFF tail") {
    assert(hex(PdfCrypt.fileKey(o, p, fid, r = 4, keyBytes = 16,
      encryptMetadata = false)) == "3db396083bc542d48836fa9505849bc4")
  }

  test("Algorithm 1: AES per-object key appends sAlT (obj 7 gen 0)") {
    val k = PdfCrypt.fileKey(o, p, fid, r = 4, keyBytes = 16,
      encryptMetadata = false)
    assert(hex(PdfCrypt.objKey(PdfCrypt.Ctx(k, aes = true), 7, 0)) ==
      "58ed1340b9998fd2470bd3f4af3511b0")
  }

  test("R3 with a 40-bit /Length: re-hash truncates to keyBytes each round") {
    val k = PdfCrypt.fileKey(o, p, fid, r = 3, keyBytes = 5)
    assert(hex(k) == "109b9d8133")
    // short keys extend the object key to n+5 = 10 bytes
    assert(hex(PdfCrypt.objKey(PdfCrypt.Ctx(k, aes = false), 12, 3)) ==
      "1c8c3987402ec0b5efdb")
  }

  test("documents without /ID: the empty-fileId derivation") {
    val k = PdfCrypt.fileKey(o, p, Array.emptyByteArray, r = 3, keyBytes = 16)
    assert(hex(k) == "6c2c5b66616e300c03f5f3079aabdcf0")
    assert(hex(PdfCrypt.emptyUserU(k, Array.emptyByteArray, r = 3).take(16)) ==
      "7b6ded12eb61e0695873b2b9970c98e2")
  }

  test("checkEmptyUser accepts the derived /U and rejects a perturbed one") {
    val k = PdfCrypt.fileKey(o, p, fid, r = 3, keyBytes = 16)
    val u = PdfCrypt.emptyUserU(k, fid, r = 3).padTo(32, 0.toByte)
    assert(PdfCrypt.checkEmptyUser(k, fid, r = 3, u))
    val bad = u.clone(); bad(0) = (bad(0) ^ 1).toByte
    assert(!PdfCrypt.checkEmptyUser(k, fid, r = 3, bad))
    assert(!PdfCrypt.checkEmptyUser(k, fid, r = 3, u.take(8))) // short /U
  }

  // ------------------ /V 5 AES-256 (ISO 32000-2, r15 — same r14
  // discipline: every expected hex below was computed independently
  // in Python, hashlib SHA-2 + the cryptography package's AES,
  // following Algorithms 2.A/2.B/11/13 from the spec text)

  private val vsalt = Array.tabulate[Byte](8)(i => (0xA0 + i).toByte)
  private val ksalt = Array.tabulate[Byte](8)(i => (0xB0 + i).toByte)
  private val fileKey256 =
    Array.tabulate[Byte](32)(i => ((i * 17 + 3) & 0xff).toByte)

  test("Algorithm 2.B (R6): hardened hash of the empty password") {
    assert(hex(PdfCrypt.hash2B(6, Array.emptyByteArray, vsalt)) ==
      "e6ffee2b00f4fc6fcf2717ea01d94bb7bbfc74fc318ce7550dc589500ea33b17")
  }

  test("R5 legacy hash: single SHA-256 of pwd ++ salt") {
    assert(hex(PdfCrypt.hash2B(5, Array.emptyByteArray, vsalt)) ==
      "ebaeb334608f2c327073263eb7ea23a4ace2aa98e0f5a7d04cce3af547bcc329")
  }

  test("Algorithm 2.B with a non-empty password (concatenation order)") {
    assert(hex(PdfCrypt.hash2B(6, "test".getBytes("ISO-8859-1"), vsalt)) ==
      "7bd63656b16382e397778f44b008a0335cff3352862981eef4e1633615710956")
  }

  test("Algorithm 2.A f-g (R6): /U validates, /UE decrypts to the file key") {
    val u = PdfCrypt.hash2B(6, Array.emptyByteArray, vsalt) ++ vsalt ++ ksalt
    // UE = AES-256-CBC(intermediate key, zero IV) of the file key,
    // computed independently (ik pinned below through this value)
    val ue = hexBytes(
      "a9129a237fe259273617eeccd1eddcb2fbb5ffa06a3434286eebb56b50267cf0")
    assert(PdfCrypt.fileKeyV5(6, u, ue).map(hex).contains(hex(fileKey256)))
  }

  test("Algorithm 2.A f-g (R5): the legacy hash drives both salts") {
    val u = PdfCrypt.hash2B(5, Array.emptyByteArray, vsalt) ++ vsalt ++ ksalt
    val ue = hexBytes(
      "7c58962c3751886c73035ddd3ec8d8fa3371c646382bbffb3c4e457a37c9454d")
    assert(PdfCrypt.fileKeyV5(5, u, ue).map(hex).contains(hex(fileKey256)))
  }

  test("fileKeyV5 rejects a real user password (perturbed /U hash) and " +
      "short /U//UE") {
    val u = PdfCrypt.hash2B(6, Array.emptyByteArray, vsalt) ++ vsalt ++ ksalt
    val ue = hexBytes(
      "a9129a237fe259273617eeccd1eddcb2fbb5ffa06a3434286eebb56b50267cf0")
    val bad = u.clone(); bad(0) = (bad(0) ^ 1).toByte
    assert(PdfCrypt.fileKeyV5(6, bad, ue).isEmpty)
    assert(PdfCrypt.fileKeyV5(6, u.take(40), ue).isEmpty)
    assert(PdfCrypt.fileKeyV5(6, u, ue.take(16)).isEmpty)
  }

  test("Algorithm 13: /Perms verifies 'adb' under the file key") {
    // ECB encryption of [P LE | FFx4 | 'T' | 'adb' | 4 bytes], P=-44,
    // computed independently
    val perms = hexBytes("74181424009000a053fc68ee9b71ec57")
    assert(PdfCrypt.checkPerms(fileKey256, perms))
    val bad = perms.clone(); bad(3) = (bad(3) ^ 1).toByte
    assert(!PdfCrypt.checkPerms(fileKey256, bad))
    assert(!PdfCrypt.checkPerms(fileKey256, perms.take(8)))
  }

  test("V5 ctx: the file key IS the per-object key") {
    val ctx = PdfCrypt.Ctx(fileKey256, aes = true, v5 = true)
    assert(hex(PdfCrypt.objKey(ctx, 7, 0)) == hex(fileKey256))
    assert(hex(PdfCrypt.objKey(ctx, 123, 4)) == hex(fileKey256))
  }

  private def hexBytes(s: String): Array[Byte] =
    s.grouped(2).map(h => Integer.parseInt(h, 16).toByte).toArray
}
