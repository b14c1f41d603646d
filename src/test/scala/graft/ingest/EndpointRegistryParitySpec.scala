package graft.ingest

import org.scalatest.funsuite.AnyFunSuite

/** Prose-parity gate for the endpoint registry (VERDICT r10 §next-6):
  * every registered endpoint's description must equal the reference
  * registry's VERBATIM (`LLM_Ingestor/api_registry.py:64-1337`). The
  * descriptions are the data contract [[EndpointValidator]]'s semantic
  * match scores plans against — the reference feeds exactly this prose
  * to its MiniLM index (api_registry.py:78,617) — so a silent edit
  * here would shift every semantic score. The spec parses the
  * reference source (read-only, data strings only) rather than
  * hand-copying expectations, so drift on either side fails loudly.
  *
  * Skips (rather than fails) when the reference checkout is absent, so
  * the suite still runs in environments that ship only this repo.
  */
class EndpointRegistryParitySpec extends AnyFunSuite {

  private val refPath =
    java.nio.file.Paths.get("/root/reference/LLM_Ingestor/api_registry.py")

  /** name -> description pairs from one provider's section of the
    * reference source. Descriptions there are single-line double-quoted
    * string literals with no escapes.
    */
  private def refDescriptions(section: String): Map[String, String] = {
    val src = new String(java.nio.file.Files.readAllBytes(refPath), "UTF-8")
    // provider sections: polygon builder first, alpha vantage builder after
    val avStart = src.indexOf("def build_alpha_vantage_api")
    require(avStart > 0, "reference registry layout changed")
    val slice =
      if (section == "polygon") src.substring(0, avStart)
      else src.substring(avStart)
    val pat = """name="([A-Za-z_]+)",\s*description="([^"]*)"""".r
    pat.findAllMatchIn(slice).map(m => m.group(1) -> m.group(2)).toMap
  }

  private def assume(cond: Boolean, msg: String): Unit =
    if (!cond) cancel(msg)

  test("every registered endpoint carries the reference's verbatim description") {
    assume(java.nio.file.Files.isReadable(refPath), "reference checkout absent")
    val refByProvider = Map(
      "polygon" -> refDescriptions("polygon"),
      "alpha_vantage" -> refDescriptions("alpha_vantage"))
    EndpointRegistry.apis.foreach { api =>
      val ref = refByProvider(api.name)
      api.endpoints.foreach { ep =>
        val expected = ref.get(ep.name)
        assert(expected.nonEmpty,
          s"${api.name}/${ep.name}: not present in the reference registry")
        assert(ep.description == expected.get,
          s"${api.name}/${ep.name}: description diverges from reference\n" +
            s"  registry:  ${ep.description}\n  reference: ${expected.get}")
      }
    }
  }

  test("the registry misses no reference endpoint (inventory parity per provider)") {
    assume(java.nio.file.Files.isReadable(refPath), "reference checkout absent")
    Seq("polygon" -> EndpointRegistry.polygon,
        "alpha_vantage" -> EndpointRegistry.alphaVantage).foreach {
      case (section, api) =>
        val refNames = refDescriptions(section).keySet
        val have = api.endpoints.map(_.name).toSet
        val missing = refNames -- have
        assert(missing.isEmpty,
          s"$section: reference endpoints missing from the registry: $missing")
    }
  }
}
