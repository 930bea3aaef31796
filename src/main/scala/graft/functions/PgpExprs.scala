package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, Nondeterministic, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{BinaryType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Catalyst surface for the pgcrypto PGP family (PgpAlg): scalar,
  * per-row, CodegenFallback (crypto work dwarfs the virtual-call
  * overhead; everything stays distributed). Encryption draws a fresh
  * salt + prefix per call, so it is declared Nondeterministic exactly
  * like pgcrypto's (validated by round-trip, never by value). */
case class PgpArmor(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  override def prettyName: String = "armor"
  override protected def nullSafeEval(input: Any): Any =
    UTF8String.fromString(PgpAlg.armor(input.asInstanceOf[Array[Byte]]))
  override protected def withNewChildInternal(c: Expression): PgpArmor =
    copy(child = c)
}

case class PgpDearmor(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = BinaryType
  override def prettyName: String = "dearmor"
  override protected def nullSafeEval(input: Any): Any =
    PgpAlg.dearmor(input.asInstanceOf[UTF8String].toString)
  override protected def withNewChildInternal(c: Expression): PgpDearmor =
    copy(child = c)
}

case class PgpKeyId(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  override def prettyName: String = "pgp_key_id"
  override protected def nullSafeEval(input: Any): Any =
    UTF8String.fromString(PgpAlg.keyId(input.asInstanceOf[Array[Byte]]))
  override protected def withNewChildInternal(c: Expression): PgpKeyId =
    copy(child = c)
}

case class PgpSymEncrypt(data: Expression, psw: Expression, args: Expression,
                         textMode: Boolean)
    extends Expression with Nondeterministic with CodegenFallback {
  override def children: Seq[Expression] = Seq(data, psw, args)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String =
    if (textMode) "pgp_sym_encrypt" else "pgp_sym_encrypt_bytea"

  @transient private var rng: java.security.SecureRandom = _
  override protected def initializeInternal(partitionIndex: Int): Unit =
    rng = new java.security.SecureRandom()

  override protected def evalInternal(input: InternalRow): Any = {
    val d = data.eval(input)
    val p = psw.eval(input)
    val a = args.eval(input)
    if (d == null || p == null || a == null) null
    else {
      val opts = PgpAlg.parseOptions(a.asInstanceOf[UTF8String].toString)
      val raw =
        if (textMode) d.asInstanceOf[UTF8String].getBytes
        else d.asInstanceOf[Array[Byte]]
      PgpAlg.symEncrypt(raw,
        p.asInstanceOf[UTF8String].getBytes, opts, textMode, rng)
    }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): PgpSymEncrypt =
    copy(data = newChildren(0), psw = newChildren(1), args = newChildren(2))
}

case class PgpSymDecrypt(data: Expression, psw: Expression, args: Expression,
                         textMode: Boolean)
    extends Expression with CodegenFallback {
  override def children: Seq[Expression] = Seq(data, psw, args)
  override def dataType: DataType = if (textMode) StringType else BinaryType
  override def nullable: Boolean = true
  override def prettyName: String =
    if (textMode) "pgp_sym_decrypt" else "pgp_sym_decrypt_bytea"

  override def eval(input: InternalRow): Any = {
    val d = data.eval(input)
    val p = psw.eval(input)
    val a = args.eval(input)
    if (d == null || p == null || a == null) null
    else {
      val opts = PgpAlg.parseOptions(a.asInstanceOf[UTF8String].toString)
      val out = PgpAlg.symDecrypt(d.asInstanceOf[Array[Byte]],
        p.asInstanceOf[UTF8String].getBytes, opts, textMode)
      if (textMode)
        UTF8String.fromString(new String(out, java.nio.charset.StandardCharsets.UTF_8))
      else out
    }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): PgpSymDecrypt =
    copy(data = newChildren(0), psw = newChildren(1), args = newChildren(2))
}
