package graft.expressions

import org.apache.spark.unsafe.types.UTF8String

import java.security.MessageDigest
import javax.crypto.Mac
import javax.crypto.spec.SecretKeySpec

/** Crypto/encoding kernel for the reference's crypto library
  * (/root/reference/lib/crypto.go). Digests return raw BYTES (mito
  * semantics — crypto.go:583-627), unlike Spark's hex-string md5/sha;
  * callers chain `.hex()`/`.base64()` for text forms, exactly as the
  * reference does (crypto.go:113-114).
  */
object CryptoKernel {
  private def digest(alg: String, data: Array[Byte]): Array[Byte] =
    MessageDigest.getInstance(alg).digest(data)

  /** crypto.go:583 */
  def md5Bytes(data: Array[Byte]): Array[Byte] = digest("MD5", data)
  /** crypto.go:598 */
  def sha1Bytes(data: Array[Byte]): Array[Byte] = digest("SHA-1", data)
  /** crypto.go:613 */
  def sha256Bytes(data: Array[Byte]): Array[Byte] = digest("SHA-256", data)

  /** hmac(val, "sha1"|"sha256", key) -> raw bytes. crypto.go:628-660 */
  def hmac(data: Array[Byte], hash: UTF8String, key: Array[Byte]): Array[Byte] = {
    val alg = hash.toString match {
      case "sha1"   => "HmacSHA1"
      case "sha256" => "HmacSHA256"
      case other    => throw new IllegalArgumentException(s"unsupported hash: $other")
    }
    val mac = Mac.getInstance(alg)
    mac.init(new SecretKeySpec(key, alg))
    mac.doFinal(data)
  }

  /** base64 with padding (Go StdEncoding). crypto.go:524 */
  def base64Std(data: Array[Byte]): UTF8String =
    UTF8String.fromString(java.util.Base64.getEncoder.encodeToString(data))

  /** raw (unpadded) base64. crypto.go:548 */
  def base64Raw(data: Array[Byte]): UTF8String =
    UTF8String.fromString(java.util.Base64.getEncoder.withoutPadding.encodeToString(data))

  /** decode padded base64. crypto.go:535 */
  def base64Decode(s: UTF8String): Array[Byte] =
    java.util.Base64.getDecoder.decode(s.toString)

  /** decode raw base64. crypto.go:559 */
  def base64RawDecode(s: UTF8String): Array[Byte] =
    java.util.Base64.getDecoder.decode(s.toString.stripSuffix("=").stripSuffix("="))

  private val hexDigits: Array[Byte] = "0123456789abcdef".getBytes

  /** lowercase hex. crypto.go:572 */
  def hexEncode(data: Array[Byte]): UTF8String = {
    val out = new Array[Byte](data.length * 2)
    var i = 0
    while (i < data.length) {
      val v = data(i) & 0xff
      out(2 * i) = hexDigits(v >>> 4)
      out(2 * i + 1) = hexDigits(v & 15)
      i += 1
    }
    UTF8String.fromBytes(out)
  }
}
