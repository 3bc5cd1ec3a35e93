package graft.sources

import java.nio.file.{Files, Path}

import javax.crypto.Cipher
import javax.crypto.spec.{GCMParameterSpec, SecretKeySpec}

/** Publishing-credential rotation (OP-54, `cdt_arcgis_auth.py:1-48`).
  * The reference file is design notes + a params sketch: manage
  * short-lived OAuth2 credentials ("last up to two weeks, but can be
  * rotated programmatically") from a one-time initialization value, so
  * that a daily run (1) rotates the key, (2) then does the data work —
  * and if the pipeline itself ever stops running, the rotation still
  * must. Persisted state is explicitly required to be two-way
  * encrypted, "even if the encryption key is hardcoded here, it means
  * the value on disk can't be used as-is" (`cdt_arcgis_auth.py:12-15`).
  *
  * Engine mapping, zero-egress like [[FeatureService]]: the token
  * endpoint is an injected `rotate: oldToken → Credential` transport
  * and the clock is injected, so the vault's whole contract — bootstrap
  * from the init value, refresh inside the expiry margin, re-bootstrap
  * after state loss or a corrupt store — is spec-testable offline
  * (`CredentialVaultSpec`). At-rest protection is AES-GCM with a
  * build-constant key: exactly the reference's "hardcoded key beats
  * plaintext" posture; real deployments swap in an OS keystore by
  * passing `keyBytes`.
  *
  * Driver-side publishing plumbing, not a query operator — spec'd, not
  * oracled (same scoping as OP-53).
  */
object CredentialVault {

  /** `params` sketch (`cdt_arcgis_auth.py:43-48`): the token plus its
    * absolute expiry (the sketch's relative `expires_in` is resolved
    * against the injected clock at acquisition time).
    */
  final case class Credential(accessToken: String, expiresAtMillis: Long)

  // reference point 1: a hardcoded two-way key still keeps the on-disk
  // value unusable as-is; callers with a real keystore override it
  private val defaultKey: Array[Byte] =
    java.security.MessageDigest.getInstance("SHA-256")
      .digest("graft-credential-vault".getBytes("UTF-8")).take(16)

  private val GcmTagBits = 128
  private val IvLen = 12

  /** token '\n' expiry, AES-GCM sealed, random IV prepended. */
  def seal(c: Credential, keyBytes: Array[Byte] = defaultKey): Array[Byte] = {
    val iv = new Array[Byte](IvLen)
    new java.security.SecureRandom().nextBytes(iv)
    val cipher = Cipher.getInstance("AES/GCM/NoPadding")
    cipher.init(Cipher.ENCRYPT_MODE, new SecretKeySpec(keyBytes, "AES"),
      new GCMParameterSpec(GcmTagBits, iv))
    val ct = cipher.doFinal(
      s"${c.accessToken}\n${c.expiresAtMillis}".getBytes("UTF-8"))
    iv ++ ct
  }

  def unseal(bytes: Array[Byte], keyBytes: Array[Byte] = defaultKey): Credential = {
    val cipher = Cipher.getInstance("AES/GCM/NoPadding")
    cipher.init(Cipher.DECRYPT_MODE, new SecretKeySpec(keyBytes, "AES"),
      new GCMParameterSpec(GcmTagBits, bytes.take(IvLen)))
    val parts = new String(cipher.doFinal(bytes.drop(IvLen)), "UTF-8").split("\n", 2)
    Credential(parts(0), parts(1).toLong)
  }
}

/** One credential store on disk.
  *
  * @param path          sealed-credential file
  * @param rotate        token endpoint: current (or init) token → fresh
  *                      credential; injected transport, never called
  *                      unless rotation is actually due
  * @param clock         epoch-millis source
  * @param refreshMargin rotate when `expiresAt − now ≤ margin`; the
  *                      reference's daily-run-vs-two-week-expiry scheme
  *                      needs margin ≥ one scheduling period
  * @param keyBytes      16-byte AES key for at-rest sealing
  */
final class CredentialVault(
    path: Path,
    rotate: String => CredentialVault.Credential,
    clock: () => Long = () => System.currentTimeMillis(),
    refreshMargin: Long = 24L * 3600 * 1000,
    keyBytes: Array[Byte] = null) {

  import CredentialVault._

  private def key: Array[Byte] = Option(keyBytes).getOrElse(
    java.security.MessageDigest.getInstance("SHA-256")
      .digest("graft-credential-vault".getBytes("UTF-8")).take(16))

  /** Stored credential if present, readable, and intact; a missing,
    * truncated, or tampered file reads as None — the caller falls back
    * to the init value, the reference's recovery story ("even if the
    * user account … is lost, we can set it up again with a new
    * initialization credential", `cdt_arcgis_auth.py:28-30`).
    */
  def stored: Option[Credential] =
    if (!Files.exists(path)) None
    else
      try Some(unseal(Files.readAllBytes(path), key))
      catch { case scala.util.control.NonFatal(_) => None }

  private def persist(c: Credential): Credential = {
    Option(path.getParent).foreach(Files.createDirectories(_))
    // sibling-temp + atomic promote, not a bare Files.write: the
    // server-side rotation has ALREADY happened when this runs, so a
    // crash mid-write would tear the vault file and lose the only
    // copy of the new token (the old one is invalidated) — the
    // corrupt-reads-as-None fallback then re-rotates from `init`,
    // which may be single-use (r20 review)
    AtomicFiles.write(path, seal(c, key))
    c
  }

  /** Rotate with the stored token, falling back to `init` when the
    * endpoint rejects it: a vault whose token lapsed entirely (the
    * pipeline paused past the token lifetime) is otherwise stuck
    * rotating with a dead token on every run — the documented
    * state-loss recovery ("set it up again with a new initialization
    * credential") must engage even though the FILE is intact (r20
    * review). An `init` failure propagates — there is nothing left to
    * fall back to.
    */
  private def rotateWithFallback(storedToken: String, init: => String): Credential =
    try rotate(storedToken)
    catch { case scala.util.control.NonFatal(_) => rotate(init) }

  /** The daily-run entry point (`cdt_arcgis_auth.py:32-37`): returns a
    * live token, rotating first when none is stored, the store was
    * corrupt, or expiry is inside the refresh margin. `init` is only
    * evaluated when bootstrapping or when the stored token is rejected.
    */
  def current(init: => String): Credential = stored match {
    case Some(c) if c.expiresAtMillis - clock() > refreshMargin => c
    case Some(c) => persist(rotateWithFallback(c.accessToken, init))
    case None    => persist(rotate(init))
  }

  /** Unconditional rotation — step 1 of the reference's daily run. */
  def rotateNow(init: => String): Credential =
    persist(stored match {
      case Some(c) => rotateWithFallback(c.accessToken, init)
      case None    => rotate(init)
    })
}
