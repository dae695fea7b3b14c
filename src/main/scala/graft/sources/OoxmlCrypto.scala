package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import java.security.MessageDigest
import javax.crypto.Cipher
import javax.crypto.spec.{IvParameterSpec, SecretKeySpec}

/** OOXML "agile" encryption (MS-OFFCRYPTO §2.3.4) — password-protected
  * xlsx/docx/pptx decryption, pure JDK crypto. The reference reaches this
  * via the ooxml_decrypt gem (`file/excel.rb:96-99`, `file/docx.rb:34-42`);
  * here it is implemented natively: the encrypted document is an OLE2
  * container ([[Cfb]]) holding `EncryptionInfo` (XML parameters) and
  * `EncryptedPackage` (the AES-CBC-encrypted zip, 4096-byte segments with
  * per-segment IVs derived from the keyData salt).
  */
object OoxmlCrypto {

  final class BadPasswordError extends RuntimeException("Invalid password")

  private val VerifierInputBlock = Array(0xfe, 0xa7, 0xd2, 0x76, 0x3b, 0x4b, 0x9e, 0x79).map(_.toByte)
  private val VerifierValueBlock = Array(0xd7, 0xaa, 0x0f, 0x6d, 0x30, 0x61, 0x34, 0x4e).map(_.toByte)
  private val KeyValueBlock = Array(0x14, 0x6e, 0x0b, 0xe7, 0xab, 0xac, 0xd0, 0xd6).map(_.toByte)

  def isEncrypted(bytes: Array[Byte]): Boolean =
    Cfb.isCfb(bytes) && {
      try new Cfb.CompoundFile(bytes).stream("EncryptionInfo").isDefined
      catch { case _: Exception => false }
    }

  /** Decrypt an agile-encrypted OOXML container to its zip payload. */
  def decrypt(bytes: Array[Byte], password: String): Array[Byte] = {
    val cf = new Cfb.CompoundFile(bytes)
    val info = cf.stream("EncryptionInfo").getOrElse(sys.error("No EncryptionInfo stream"))
    val pkg = cf.stream("EncryptedPackage").getOrElse(sys.error("No EncryptedPackage stream"))

    val major = ByteBuffer.wrap(info, 0, 2).order(ByteOrder.LITTLE_ENDIAN).getShort
    require(major == 4, s"Only agile encryption (v4) is supported, got v$major")
    val xml = scala.xml.XML.loadString(new String(info.drop(8), "UTF-8"))

    val keyData = (xml \ "keyData").head
    val pw = (xml \ "keyEncryptors" \ "keyEncryptor" \ "encryptedKey").head

    def b64(n: scala.xml.Node, attr: String): Array[Byte] =
      java.util.Base64.getDecoder.decode(n \@ attr)
    def num(n: scala.xml.Node, attr: String): Int = (n \@ attr).toInt

    val pwSalt = b64(pw, "saltValue")
    val spinCount = num(pw, "spinCount")
    val pwKeyBits = num(pw, "keyBits")
    val pwHashAlg = hashAlg(pw \@ "hashAlgorithm")
    val pwHashSize = num(pw, "hashSize")

    // Iterated password hash (§2.3.4.11): H(salt+pwd), then
    // H(LE32(i) ++ previous) spinCount times.
    val md = MessageDigest.getInstance(pwHashAlg)
    var h = md.digest(pwSalt ++ password.getBytes("UTF-16LE"))
    val iterBuf = new Array[Byte](4)
    var i = 0
    while (i < spinCount) {
      iterBuf(0) = i.toByte; iterBuf(1) = (i >> 8).toByte
      iterBuf(2) = (i >> 16).toByte; iterBuf(3) = (i >> 24).toByte
      md.reset(); md.update(iterBuf); md.update(h)
      h = md.digest()
      i += 1
    }

    def derivedKey(blockKey: Array[Byte]): Array[Byte] = {
      md.reset(); md.update(h); md.update(blockKey)
      md.digest().take(pwKeyBits / 8)
    }
    def aes(mode: Int, key: Array[Byte], iv: Array[Byte], data: Array[Byte]): Array[Byte] = {
      val c = Cipher.getInstance("AES/CBC/NoPadding")
      c.init(mode, new SecretKeySpec(key, "AES"), new IvParameterSpec(iv.take(16)))
      c.doFinal(data)
    }

    // Verify the password.
    val verifierInput = aes(Cipher.DECRYPT_MODE, derivedKey(VerifierInputBlock), pwSalt,
      b64(pw, "encryptedVerifierHashInput"))
    val verifierValue = aes(Cipher.DECRYPT_MODE, derivedKey(VerifierValueBlock), pwSalt,
      b64(pw, "encryptedVerifierHashValue"))
    md.reset()
    val vHash = md.digest(verifierInput)
    val cmp = math.min(pwHashSize, math.min(vHash.length, verifierValue.length))
    if (!vHash.take(cmp).sameElements(verifierValue.take(cmp)))
      throw new BadPasswordError

    // The intermediate (package) key.
    val packageKey = aes(Cipher.DECRYPT_MODE, derivedKey(KeyValueBlock), pwSalt,
      b64(pw, "encryptedKeyValue")).take(num(keyData, "keyBits") / 8)

    // Decrypt the package: LE64 size prefix, then 4096-byte segments with
    // IV = H(keyData.salt ++ LE32(segment)) truncated to blockSize.
    val kdSalt = b64(keyData, "saltValue")
    val kdHash = MessageDigest.getInstance(hashAlg(keyData \@ "hashAlgorithm"))
    val size = ByteBuffer.wrap(pkg, 0, 8).order(ByteOrder.LITTLE_ENDIAN).getLong
    val out = new java.io.ByteArrayOutputStream(size.toInt)
    var seg = 0
    var pos = 8
    while (pos < pkg.length) {
      val n = math.min(4096, pkg.length - pos)
      val segBuf = new Array[Byte](4)
      segBuf(0) = seg.toByte; segBuf(1) = (seg >> 8).toByte
      segBuf(2) = (seg >> 16).toByte; segBuf(3) = (seg >> 24).toByte
      kdHash.reset(); kdHash.update(kdSalt); kdHash.update(segBuf)
      val iv = kdHash.digest()
      val block = pkg.slice(pos, pos + n)
      val padded = if (block.length % 16 == 0) block
        else block.padTo(block.length + (16 - block.length % 16), 0.toByte)
      out.write(aes(Cipher.DECRYPT_MODE, packageKey, iv, padded), 0, n)
      pos += n
      seg += 1
    }
    out.toByteArray.take(size.toInt)
  }

  private def hashAlg(name: String): String = name.toUpperCase match {
    case "SHA512" | "SHA-512" => "SHA-512"
    case "SHA384" | "SHA-384" => "SHA-384"
    case "SHA256" | "SHA-256" => "SHA-256"
    case "SHA1" | "SHA-1"     => "SHA-1"
    case other                => other
  }
}
