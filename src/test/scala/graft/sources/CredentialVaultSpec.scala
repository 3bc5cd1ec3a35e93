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

  test("a rejected stored token falls back to init instead of wedging the vault") {
    // pipeline paused past the token lifetime: the stored token is
    // intact on disk but DEAD at the endpoint. Rotating with it on
    // every run wedged the vault until the file was deleted by hand —
    // the documented state-loss recovery must engage (r20 review).
    var now = 0L
    var calls = 0
    val rejectDead: String => Credential = { old =>
      calls += 1
      if (old.startsWith("dead")) throw new RuntimeException("401: token expired")
      Credential(s"$old/r$calls", now + twoWeeks)
    }
    val path = Files.createTempDirectory("vault").resolve("cred.sealed")
    val vault = new CredentialVault(path, rejectDead, () => now, refreshMargin = day)
    // seed the vault with a token the endpoint will reject
    Files.write(path, CredentialVault.seal(Credential("dead-token", now + day / 4)))
    val c = vault.current("fresh-init")
    assert(c.accessToken == "fresh-init/r2", s"got ${c.accessToken}")
    assert(calls == 2, "dead-token rotate, then the init fallback")
    // an init failure propagates — nothing left to fall back to
    Files.write(path, CredentialVault.seal(Credential("dead-again", now + day / 4)))
    intercept[RuntimeException] { vault.current("dead-init") }
  }

  test("persist survives no partial vault: the publish is temp + atomic promote") {
    // a crash mid-write would otherwise tear the file AFTER the
    // server-side rotation invalidated the old token — the sealed
    // bytes must appear atomically (no .writing residue, full file)
    var now = 0L
    val ep = new Endpoint(() => now)
    val (path, vault) = vaultAt(() => now, ep)
    vault.current("seed")
    val dir = path.getParent
    val s = Files.list(dir)
    val names = try {
      val it = s.iterator(); val b = Seq.newBuilder[String]
      while (it.hasNext) b += it.next().getFileName.toString
      b.result()
    } finally s.close()
    assert(names == Seq("cred.sealed"), s"unexpected residue: $names")
    assert(vault.stored.exists(_.accessToken == "seed/r1"))
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
