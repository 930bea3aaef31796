package graft

import java.nio.charset.StandardCharsets

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.PgpAlg

/** pgcrypto PGP family — every armored vector here is copied verbatim
  * from the reference's own regression inputs
  * (`contrib/pgcrypto/sql/pgp-decrypt.sql`, `pgp-armor.sql`) with the
  * expected outputs from the matching expected .out files, so decryption
  * is differential-tested against the real pgcrypto across ciphers,
  * S2K modes, digests, MDC on/off, partial-length packets, and CRLF
  * conversion. The writer side is covered by round-trips through our
  * own decoder over the full option matrix. */
class PgpSpec extends AnyFunSuite {

  private def sha1hex(b: Array[Byte]): String =
    java.security.MessageDigest.getInstance("SHA-1").digest(b)
      .map(x => f"${x & 0xff}%02x").mkString

  private def dec(armored: String, psw: String, args: String = ""): String =
    new String(PgpAlg.symDecrypt(PgpAlg.dearmor(armored),
      psw.getBytes(StandardCharsets.UTF_8), PgpAlg.parseOptions(args),
      textMode = true), StandardCharsets.UTF_8)

  private def decBytes(armored: String, psw: String, args: String = ""): Array[Byte] =
    PgpAlg.symDecrypt(PgpAlg.dearmor(armored),
      psw.getBytes(StandardCharsets.UTF_8), PgpAlg.parseOptions(args),
      textMode = true)

  // --------------------------------------------------------------- armor

  test("armor/dearmor: pinned outputs and parse tolerance (pgp-armor.sql)") {
    assert(PgpAlg.armor(Array.emptyByteArray) ==
      "-----BEGIN PGP MESSAGE-----\n\n=twTO\n-----END PGP MESSAGE-----\n")
    assert(PgpAlg.armor("test".getBytes) ==
      "-----BEGIN PGP MESSAGE-----\n\ndGVzdA==\n=+G7Q\n-----END PGP MESSAGE-----\n")
    assert(new String(PgpAlg.dearmor(PgpAlg.armor("zooka".getBytes))) == "zooka")
    // 76-char wrap + pinned CRC for the two-line case
    val long = ("0123456789abcdef" * 3 + "\n" + "0123456789abcdef" * 3).getBytes
    val a = PgpAlg.armor(long)
    assert(a.contains("MDEyMzQ1Njc4OWFiY2RlZjAxMjM0NTY3ODlhYmNkZWYwMTIzNDU2Nzg5YWJjZGVmCjAxMjM0NTY3\n"))
    assert(a.contains("=JFw5"))
    // junk around the armor, comment header, blank lines before the CRC
    assert(new String(PgpAlg.dearmor(
      " a pgp msg:\n\n-----BEGIN PGP MESSAGE-----\nComment: Some junk\n\nem9va2E=\n\n  =D5cR\n\n-----END PGP MESSAGE-----")) == "zooka")
    // multiple blocks: only the first whose separators START a line
    assert(new String(PgpAlg.dearmor(
      "\nwrong packet:\n  -----BEGIN PGP MESSAGE-----\n\n  d3Jvbmc=\n  =vCYP\n  -----END PGP MESSAGE-----\n\nright packet:\n-----BEGIN PGP MESSAGE-----\n\ncmlnaHQ=\n=nbpj\n-----END PGP MESSAGE-----\n\nuse only first packet\n-----BEGIN PGP MESSAGE-----\n\nd3Jvbmc=\n=vCYP\n-----END PGP MESSAGE-----\n")) == "right")
    // corrupt CRC
    val e = intercept[IllegalArgumentException] {
      PgpAlg.dearmor("\n-----BEGIN PGP MESSAGE-----\n\nem9va2E=\n=ZZZZ\n-----END PGP MESSAGE-----\n")
    }
    assert(e.getMessage.contains("Corrupt ascii-armor"))
  }

  // ----------------------------------------------- pinned decrypt vectors

  test("pgp_sym_decrypt: cipher matrix (pgp-decrypt.sql 'Checking ciphers')") {
    assert(dec(
      """-----BEGIN PGP MESSAGE-----
        |Comment: dat1.blowfish.sha1.mdc.s2k3.z0
        |
        |jA0EBAMCfFNwxnvodX9g0jwB4n4s26/g5VmKzVab1bX1SmwY7gvgvlWdF3jKisvS
        |yA6Ce1QTMK3KdL2MPfamsTUSAML8huCJMwYQFfE=
        |=JcP+
        |-----END PGP MESSAGE-----
        |""".stripMargin, "foobar") == "Secret message.")
    assert(dec(
      """-----BEGIN PGP MESSAGE-----
        |Comment: dat1.aes.sha1.mdc.s2k3.z0
        |
        |jA0EBwMCci97v0Q6Z0Zg0kQBsVf5Oe3iC+FBzUmuMV9KxmAyOMyjCc/5i8f1Eest
        |UTAsG35A1vYs02VARKzGz6xI2UHwFUirP+brPBg3Ee7muOx8pA==
        |=XtrP
        |-----END PGP MESSAGE-----
        |""".stripMargin, "foobar") == "Secret message.")
    assert(dec(
      """-----BEGIN PGP MESSAGE-----
        |Comment: dat1.aes192.sha1.mdc.s2k3.z0
        |
        |jA0ECAMCI7YQpWqp3D1g0kQBCjB7GlX7+SQeXNleXeXQ78ZAPNliquGDq9u378zI
        |5FPTqAhIB2/2fjY8QEIs1ai00qphjX2NitxV/3Wn+6dufB4Q4g==
        |=rCZt
        |-----END PGP MESSAGE-----
        |""".stripMargin, "foobar") == "Secret message.")
    assert(dec(
      """-----BEGIN PGP MESSAGE-----
        |Comment: dat1.aes256.sha1.mdc.s2k3.z0
        |
        |jA0ECQMC4f/5djqCC1Rg0kQBTHEPsD+Sw7biBsM2er3vKyGPAQkuTBGKC5ie7hT/
        |lceMfQdbAg6oTFyJpk/wH18GzRDphCofg0X8uLgkAKMrpcmgog==
        |=fB6S
        |-----END PGP MESSAGE-----
        |""".stripMargin, "foobar") == "Secret message.")
  }

  test("pgp_sym_decrypt: MDC off (tag-9 resync CFB) and md5 S2K digest") {
    assert(dec(
      """-----BEGIN PGP MESSAGE-----
        |Comment: dat1.aes.sha1.nomdc.s2k3.z0
        |
        |jA0EBwMCnv07rlXqWctgyS2Dm2JfOKCRL4sLSLJUC8RS2cH7cIhKSuLitOtyquB+
        |u9YkgfJfsuRJmgQ9tmo=
        |=60ui
        |-----END PGP MESSAGE-----
        |""".stripMargin, "foobar") == "Secret message.")
    assert(dec(
      """-----BEGIN PGP MESSAGE-----
        |Comment: dat1.aes.md5.mdc.s2k3.z0
        |
        |jA0EBwMClrXXtOXetohg0kQBn0Kl1ymevQZRHkdoYRHgzCwSQEiss7zYff2UNzgO
        |KyRrHf7zEBuZiZ2AG34jNVMOLToj1jJUg5zTSdecUzQVCykWTA==
        |=NyLk
        |-----END PGP MESSAGE-----
        |""".stripMargin, "foobar") == "Secret message.")
  }

  test("pgp_sym_decrypt: S2K modes 0/1/3 across key sizes") {
    assert(dec(
      """-----BEGIN PGP MESSAGE-----
        |Comment: dat1.aes.sha1.mdc.s2k0.z0
        |
        |jAQEBwAC0kQBKTaLAKE3xzps+QIZowqRNb2eAdzBw2LxEW2YD5PgNlbhJdGg+dvw
        |Ah9GXjGS1TVALzTImJbz1uHUZRfhJlFbc5yGQw==
        |=YvkV
        |-----END PGP MESSAGE-----
        |""".stripMargin, "foobar") == "Secret message.")
    assert(dec(
      """-----BEGIN PGP MESSAGE-----
        |Comment: dat1.aes.sha1.mdc.s2k1.z0
        |
        |jAwEBwEC/QTByBLI3b/SRAHPxKzI6SZBo5lAEOD+EsvKQWO4adL9tDY+++Iqy1xK
        |4IaWXVKEj9R2Lr2xntWWMGZtcKtjD2lFFRXXd9dZp1ZThNDz
        |=dbXm
        |-----END PGP MESSAGE-----
        |""".stripMargin, "foobar") == "Secret message.")
    assert(dec(
      """-----BEGIN PGP MESSAGE-----
        |Comment: dat1.aes192.sha1.mdc.s2k0.z0
        |
        |jAQECAAC0kQBBDnQWkgsx9YFaqDfWmpsiyAJ6y2xG/sBvap1dySYEMuZ+wJTXQ9E
        |Cr3i2M7TgVZ0M4jp4QL0adG1lpN5iK7aQeOwMw==
        |=cg+i
        |-----END PGP MESSAGE-----
        |""".stripMargin, "foobar") == "Secret message.")
    assert(dec(
      """-----BEGIN PGP MESSAGE-----
        |Comment: dat1.aes192.sha1.mdc.s2k1.z0
        |
        |jAwECAECruOfyNDFiTnSRAEVoGXm4A9UZKkWljdzjEO/iaE7mIraltIpQMkiqCh9
        |7h8uZ2u9uRBOv222fZodGvc6bvq/4R4hAa/6qSHtm8mdmvGt
        |=aHmC
        |-----END PGP MESSAGE-----
        |""".stripMargin, "foobar") == "Secret message.")
    assert(dec(
      """-----BEGIN PGP MESSAGE-----
        |Comment: dat1.aes256.sha1.mdc.s2k0.z0
        |
        |jAQECQAC0kQB4L1eMbani07XF2ZYiXNK9LW3v8w41oUPl7dStmrJPQFwsdxmrDHu
        |rQr3WbdKdY9ufjOE5+mXI+EFkSPrF9rL9NCq6w==
        |=RGts
        |-----END PGP MESSAGE-----
        |""".stripMargin, "foobar") == "Secret message.")
    assert(dec(
      """-----BEGIN PGP MESSAGE-----
        |Comment: dat1.aes256.sha1.mdc.s2k1.z0
        |
        |jAwECQECKHhrou7ZOIXSRAHWIVP+xjVQcjAVBTt+qh9SNzYe248xFTwozkwev3mO
        |+KVJW0qhk0An+Y2KF99/bYFl9cL5D3Tl43fC8fXGl3x3m7pR
        |=SUrU
        |-----END PGP MESSAGE-----
        |""".stripMargin, "foobar") == "Secret message.")
  }

  test("pgp_sym_decrypt: long/short passwords") {
    assert(dec(
      """-----BEGIN PGP MESSAGE-----
        |Comment: dat1.aes.sha1.mdc.s2k3.z0
        |
        |jA0EBwMCx6dBiuqrYNRg0kQBEo63AvA1SCslxP7ayanLf1H0/hlk2nONVhTwVEWi
        |tTGup1mMz6Cfh1uDRErUuXpx9A0gdMu7zX0o5XjrL7WGDAZdSw==
        |=XKKG
        |-----END PGP MESSAGE-----
        |""".stripMargin, "0123456789abcdefghij") == "Secret message.")
    assert(dec(
      """-----BEGIN PGP MESSAGE-----
        |Comment: dat1.aes.sha1.mdc.s2k3.z0
        |
        |jA0EBwMCBDvYuS990iFg0kQBW31UK5OiCjWf5x6KJ8qNNT2HZWQCjCBZMU0XsOC6
        |CMxFKadf144H/vpoV9GA0f22keQgCl0EsTE4V4lweVOPTKCMJg==
        |=gWDh
        |-----END PGP MESSAGE-----
        |""".stripMargin,
      "0123456789abcdefghij2jk4h5g2j54khg23h54g2kh54g2khj54g23hj54") ==
      "Secret message.")
    assert(dec(
      """-----BEGIN PGP MESSAGE-----
        |Comment: dat1.aes.sha1.mdc.s2k3.z0
        |
        |jA0EBwMCqXbFafC+ofVg0kQBejyiPqH0QMERVGfmPOjtAxvyG5KDIJPYojTgVSDt
        |FwsDabdQUz5O7bgNSnxfmyw1OifGF+W2bIn/8W+0rDf8u3+O+Q==
        |=OxOF
        |-----END PGP MESSAGE-----
        |""".stripMargin, "x") == "Secret message.")
  }

  test("pgp_sym_decrypt: empty and partial-length payloads (dat2/dat3)") {
    // dat2 is empty (sha1 of '' pinned in pgp-decrypt.out)
    assert(sha1hex(decBytes(
      """-----BEGIN PGP MESSAGE-----
        |Comment: dat2.aes.sha1.mdc.s2k3.z0
        |
        |jA0EBwMCvdpDvidNzMxg0jUBvj8eS2+1t/9/zgemxvhtc0fvdKGGbjH7dleaTJRB
        |SaV9L04ky1qECNDx3XjnoKLC+H7IOQ==
        |=Fxen
        |-----END PGP MESSAGE-----
        |""".stripMargin, "0123456789abcdefghij")) ==
      "da39a3ee5e6b4b0d3255bfef95601890afd80709")
    assert(sha1hex(decBytes(
      """-----BEGIN PGP MESSAGE-----
        |Comment: dat3.aes.sha1.mdc.s2k3.z0
        |
        |jA0EBwMCxQvxJZ3G/HRg0lgBeYmTa7/uDAjPyFwSX4CYBgpZWVn/JS8JzILrcWF8
        |gFnkUKIE0PSaYFp+Yi1VlRfUtRQ/X/LYNGa7tWZS+4VQajz2Xtz4vUeAEiYFYPXk
        |73Hb8m1yRhQK
        |=ivrD
        |-----END PGP MESSAGE-----
        |""".stripMargin, "0123456789abcdefghij")) ==
      "5e5c135efc0dd00633efc6dfd6e731ea408a5b4c")
  }

  test("pgp_sym_decrypt: convert-crlf on decrypt (pinned sha1s)") {
    val crlfMsg =
      """-----BEGIN PGP MESSAGE-----
        |Comment: crlf mess
        |
        |ww0ECQMCt7VAtby6l4Bi0lgB5KMIZiiF/b3CfMfUyY0eDncsGXtkbu1X+l9brjpMP8eJnY79Amms
        |a3nsOzKTXUfS9VyaXo8IrncM6n7fdaXpwba/3tNsAhJG4lDv1k4g9v8Ix2dfv6Rs
        |=mBP9
        |-----END PGP MESSAGE-----
        |""".stripMargin
    assert(sha1hex(decBytes(crlfMsg, "key", "convert-crlf=0")) ==
      "9353062be7720f1446d30b9e75573a4833886784")
    assert(sha1hex(decBytes(crlfMsg, "key", "convert-crlf=1")) ==
      "7efefcab38467f7484d6fa43dc86cf5281bd78e2")
  }

  // ------------------------------------------------------------ writer side

  test("pgp_sym_encrypt round-trips across the option matrix") {
    val rng = new java.security.SecureRandom()
    val msg = "Round-trip secret — unicode: åäö™"
    val msgB = msg.getBytes(StandardCharsets.UTF_8)
    val psw = "sekret".getBytes(StandardCharsets.UTF_8)
    for (args <- Seq(
      "",
      "cipher-algo=bf",
      "cipher-algo=3des",
      "cipher-algo=aes192",
      "cipher-algo=aes256",
      "s2k-mode=0",
      "s2k-mode=1",
      "s2k-digest-algo=md5",
      "s2k-digest-algo=sha256",
      "disable-mdc=1",
      "sess-key=1",
      "sess-key=1, s2k-cipher-algo=bf, cipher-algo=aes256",
      "compress-algo=1",
      "compress-algo=2, compress-level=9",
      "disable-mdc=1, sess-key=1, compress-algo=1, cipher-algo=3des")) {
      val o = PgpAlg.parseOptions(args)
      val ct = PgpAlg.symEncrypt(msgB, psw, o, textMode = true, rng)
      val pt = PgpAlg.symDecrypt(ct, psw, o, textMode = true)
      assert(new String(pt, StandardCharsets.UTF_8) == msg, s"args=[$args]")
      // armor round-trip of the ciphertext
      assert(java.util.Arrays.equals(PgpAlg.dearmor(PgpAlg.armor(ct)), ct))
      assert(PgpAlg.keyId(ct) == "SYMKEY")
    }
    // bytea round-trip with binary content
    val bin = Array.tabulate[Byte](4096)(i => (i * 37 % 251).toByte)
    val ct = PgpAlg.symEncrypt(bin, psw, PgpAlg.Options(), textMode = false, rng)
    assert(java.util.Arrays.equals(
      PgpAlg.symDecrypt(ct, psw, PgpAlg.Options(), textMode = false), bin))
    // BUG #11905 regression shape: length 6 less than a power of 2
    val big = ("x" * 65530).getBytes(StandardCharsets.UTF_8)
    val bigCt = PgpAlg.symEncrypt(big, psw, PgpAlg.Options(), textMode = true, rng)
    assert(java.util.Arrays.equals(
      PgpAlg.symDecrypt(bigCt, psw, PgpAlg.Options(), textMode = true), big))
    // convert-crlf survives a text round-trip unchanged
    val crlfO = PgpAlg.parseOptions("convert-crlf=1")
    val nl = "line1\nline2\nline3".getBytes(StandardCharsets.UTF_8)
    val nlCt = PgpAlg.symEncrypt(nl, psw, crlfO, textMode = true, rng)
    assert(java.util.Arrays.equals(
      PgpAlg.symDecrypt(nlCt, psw, crlfO, textMode = true), nl))
    // without convert-crlf on decrypt the CRLFs written by encrypt remain
    assert(new String(PgpAlg.symDecrypt(nlCt, psw, PgpAlg.Options(),
      textMode = true), StandardCharsets.UTF_8) == "line1\r\nline2\r\nline3")
  }

  test("pgp error surface: wrong key, text/binary mismatch, cast5") {
    val rng = new java.security.SecureRandom()
    val psw = "key".getBytes(StandardCharsets.UTF_8)
    val ct = PgpAlg.symEncrypt("secret".getBytes, psw, PgpAlg.Options(),
      textMode = true, rng)
    val e1 = intercept[IllegalArgumentException] {
      PgpAlg.symDecrypt(ct, "wrong".getBytes, PgpAlg.Options(), textMode = true)
    }
    assert(e1.getMessage.contains("Wrong key or corrupt data"))
    // pgp_sym_decrypt (text) of a bytea message: "Not text data"
    val bct = PgpAlg.symEncrypt("P".getBytes, psw, PgpAlg.Options(),
      textMode = false, rng)
    val e2 = intercept[IllegalArgumentException] {
      PgpAlg.symDecrypt(bct, psw, PgpAlg.Options(), textMode = true)
    }
    assert(e2.getMessage.contains("Not text data"))
    // but bytea decrypt of a text message is fine (PG allows it)
    assert(new String(PgpAlg.symDecrypt(ct, psw, PgpAlg.Options(),
      textMode = false)) == "secret")
    intercept[IllegalArgumentException] { PgpAlg.cipherCode("idea") }
    intercept[IllegalArgumentException] {
      PgpAlg.parseOptions("cipher-algo=cast5") // parses…
      PgpAlg.symEncrypt("x".getBytes, psw,
        PgpAlg.parseOptions("cipher-algo=cast5"), textMode = true, rng)
    }
  }

  test("pgp functions registered in SQL (registration smoke)") {
    val spark = TestSpark.spark
    val row = spark.sql(
      "SELECT pgp_sym_decrypt(pgp_sym_encrypt('hi there', 'pw'), 'pw') AS t, " +
        "pgp_sym_decrypt_bytea(pgp_sym_encrypt_bytea(CAST('bin' AS BINARY), 'pw'), 'pw') AS b, " +
        "armor(CAST('test' AS BINARY)) AS a, " +
        "CAST(dearmor(armor(CAST('zooka' AS BINARY))) AS STRING) AS z, " +
        "pgp_key_id(pgp_sym_encrypt('x', 'pw')) AS kid").head()
    assert(row.getString(0) == "hi there")
    assert(new String(row.getAs[Array[Byte]](1)) == "bin")
    assert(row.getString(2).startsWith("-----BEGIN PGP MESSAGE-----"))
    assert(row.getString(3) == "zooka")
    assert(row.getString(4) == "SYMKEY")
    // options arg via SQL + cross-mode: encrypt with options, decrypt plain
    assert(spark.sql(
      "SELECT pgp_sym_decrypt(pgp_sym_encrypt('opt', 'pw', " +
        "'cipher-algo=aes256, compress-algo=2'), 'pw')").head().getString(0) == "opt")
  }
}
