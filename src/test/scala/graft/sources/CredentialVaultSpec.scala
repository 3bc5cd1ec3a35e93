package graft.sources

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** OP-54 (`cdt_arcgis_auth.py:1-48`): bootstrap, margin-driven
  * rotation, sealed-at-rest storage, and state-loss recovery.
  */
class CredentialVaultSpec extends AnyFunSuite {

  import CredentialVault.Credential

  private val day = 24L * 3600 * 1000
  private val twoWeeks = 14 * day

  /** Endpoint double: counts calls, issues tokens chained off the one
    * presented (so the spec can assert WHICH token was rotated).
    */
  private class Endpoint(clock: () => Long) {
    var calls = 0
    val rotate: String => Credential = { old =>
      calls += 1
      Credential(s"$old/r$calls", clock() + twoWeeks)
    }
  }

  private def vaultAt(now: () => Long, ep: Endpoint) = {
    val path = Files.createTempDirectory("vault").resolve("cred.sealed")
    (path, new CredentialVault(path, ep.rotate, now, refreshMargin = day))
  }

  test("bootstrap: first call rotates the init credential and persists") {
    var now = 0L
    val ep = new Endpoint(() => now)
    val (path, vault) = vaultAt(() => now, ep)
    val c = vault.current("init-token")
    assert(c.accessToken == "init-token/r1" && ep.calls == 1)
    assert(Files.exists(path))
    // fresh token, second call serves from disk without touching the endpoint
    now += day
    assert(vault.current(fail("init must not be re-evaluated")) == c)
    assert(ep.calls == 1)
  }

  test("rotation fires inside the refresh margin, chaining off the stored token") {
    var now = 0L
    val ep = new Endpoint(() => now)
    val (_, vault) = vaultAt(() => now, ep)
    val first = vault.current("seed")
    now = first.expiresAtMillis - day / 2 // inside the 1-day margin
    val second = vault.current(fail("bootstrap path must not run"))
    assert(ep.calls == 2)
    assert(second.accessToken == "seed/r1/r2", "must rotate the STORED token")
    assert(second.expiresAtMillis == now + twoWeeks)
  }

  test("on-disk bytes never contain the plaintext token and round-trip exactly") {
    val c = Credential("super-secret-publishing-token", 123456789L)
    val sealedBytes = CredentialVault.seal(c)
    assert(!new String(sealedBytes, "ISO-8859-1").contains("super-secret"))
    assert(CredentialVault.unseal(sealedBytes) == c)
    // distinct IVs: sealing twice yields different bytes for the same value
    assert(!sealedBytes.sameElements(CredentialVault.seal(c)))
  }

  test("corrupt or truncated store re-bootstraps from the init value") {
    var now = 0L
    val ep = new Endpoint(() => now)
    val (path, vault) = vaultAt(() => now, ep)
    vault.current("seed")
    Files.write(path, Array[Byte](1, 2, 3)) // tampered/truncated
    val c = vault.current("fresh-init")
    assert(c.accessToken == "fresh-init/r2", "recovery must use the init credential")
  }

  test("rotateNow always hits the endpoint — the daily run's step 1") {
    var now = 0L
    val ep = new Endpoint(() => now)
    val (_, vault) = vaultAt(() => now, ep)
    vault.current("seed")
    val rotated = vault.rotateNow(fail("stored token must win over init"))
    assert(ep.calls == 2 && rotated.accessToken == "seed/r1/r2")
    // and a rotateNow with no store bootstraps
    val ep2 = new Endpoint(() => now)
    val (_, empty) = vaultAt(() => now, ep2)
    assert(empty.rotateNow("cold-init").accessToken == "cold-init/r1")
  }

  test("a custom key seals/unseals; the default key cannot read it") {
    val key = Array.tabulate[Byte](16)(_.toByte)
    val c = Credential("tok", 42L)
    val sealedBytes = CredentialVault.seal(c, key)
    assert(CredentialVault.unseal(sealedBytes, key) == c)
    intercept[Exception](CredentialVault.unseal(sealedBytes))
  }
}
