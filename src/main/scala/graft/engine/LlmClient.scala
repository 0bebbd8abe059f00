package graft.engine

/** LLM backend seam — SURVEY.md §2.1 `_load_llm` mapping.
  *
  * The reference wires LangChain OpenAI / LlamaCpp / SageMaker backends
  * (/root/reference/polarsai/__init__.py:165-195, only the OpenAI path
  * actually works — SURVEY §7.5.4); the JVM engine keeps one seam and ships
  * the deterministic test double the reference inherited from upstream
  * (llm/deprecated/fake.py:9-24: canned output + `last_prompt` recording).
  * A live HTTP client is config-only (zero-egress environment).
  */
trait LlmClient {

  /** One completion round-trip: prompt text in, raw model text out. */
  def predict(prompt: String): String

  def name: String = getClass.getSimpleName
}

/** Deterministic stub: replays `responses` in order (sticking on the last
  * one), records every prompt — the test seam for the whole engine.
  * Mirrors FakeLLM semantics (llm/deprecated/fake.py:9-24). */
final class FakeLlm(responses: Seq[String]) extends LlmClient {
  private var idx = 0
  private val prompts = scala.collection.mutable.ArrayBuffer.empty[String]

  override def predict(prompt: String): String = synchronized {
    prompts += prompt
    val r = responses(math.min(idx, responses.length - 1))
    idx += 1
    r
  }

  def lastPrompt: Option[String] = synchronized(prompts.lastOption)
  def allPrompts: Seq[String] = synchronized(prompts.toList)
  def callCount: Int = synchronized(prompts.length)
}

object FakeLlm {
  def apply(responses: String*): FakeLlm = new FakeLlm(responses)
}
