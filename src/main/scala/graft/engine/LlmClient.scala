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

/** OpenAI-compatible chat-completions client — the reference's only working
  * backend is LangChain OpenAI (/root/reference/polarsai/__init__.py:178-182);
  * this is the config-only JVM equivalent: POST {url}/chat/completions with
  * a single user message, return choices[0].message.content.
  *
  * This one client also covers the reference's LOCAL-inference branch
  * (LlamaCpp, __init__.py:183-188 — dead code there, SURVEY §7.5.4):
  * llama.cpp's `llama-server`, vLLM, and Ollama all expose this same
  * /chat/completions surface, so "local model" is a URL, not a backend
  * class. SageMaker-style signed endpoints would be a second
  * implementation of the 1-method LlmClient trait.
  *
  * Config resolves from constructor args, then GRAFT_LLM_URL /
  * GRAFT_LLM_MODEL / GRAFT_LLM_KEY env vars. Never exercised against a live
  * endpoint in CI (zero-egress sandbox) — EngineSpec round-trips it through
  * an in-process stub server.
  */
final class HttpLlm(
    url: String = sys.env.getOrElse("GRAFT_LLM_URL", "http://localhost:8000/v1"),
    model: String = sys.env.getOrElse("GRAFT_LLM_MODEL", "gpt-4o-mini"),
    apiKey: String = sys.env.getOrElse("GRAFT_LLM_KEY", ""),
    temperature: Double = 0.0,
    timeoutSec: Long = 120,
    maxAttempts: Int = 3,
    backoffMs: Long = 200) extends LlmClient {

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
  private val client = java.net.http.HttpClient.newBuilder()
    .connectTimeout(java.time.Duration.ofSeconds(timeoutSec)).build()

  override def name: String = s"HttpLlm($model)"

  /** Rate limits (429) and server errors (5xx) are transient: linear
    * backoff with ±20% jitter (so a fleet of clients that got rate-limited
    * together doesn't retry in lockstep), up to maxAttempts. Client errors
    * and shape errors fail fast (a 401 won't heal by retrying); exhaustion
    * reports how many attempts were burned. */
  override def predict(prompt: String): String = {
    var attempt = 0
    while (true) {
      attempt += 1
      try return predictOnce(prompt)
      catch {
        case e: RetryableHttp if attempt < maxAttempts =>
          val base = backoffMs * attempt
          val jitter = ((scala.util.Random.nextDouble() - 0.5) * 0.4 * base).toLong
          Thread.sleep(math.max(0L, base + jitter))
        case e: RetryableHttp =>
          throw new RuntimeException(
            s"${e.getMessage} (attempt $attempt/$maxAttempts)")
      }
    }
    throw new IllegalStateException("unreachable")
  }

  private final class RetryableHttp(msg: String) extends RuntimeException(msg)

  private def predictOnce(prompt: String): String = {
    val root = mapper.createObjectNode()
    root.put("model", model)
    root.put("temperature", temperature)
    val m = root.putArray("messages").addObject()
    m.put("role", "user")
    m.put("content", prompt)
    val req = java.net.http.HttpRequest
      .newBuilder(java.net.URI.create(s"${url.stripSuffix("/")}/chat/completions"))
      .timeout(java.time.Duration.ofSeconds(timeoutSec))
      .header("Content-Type", "application/json")
      .header("Authorization", s"Bearer $apiKey")
      .POST(java.net.http.HttpRequest.BodyPublishers.ofString(
        mapper.writeValueAsString(root)))
      .build()
    val resp = client.send(req, java.net.http.HttpResponse.BodyHandlers.ofString())
    val code = resp.statusCode()
    if (code == 429 || code / 100 == 5)
      throw new RetryableHttp(s"LLM HTTP $code: ${resp.body().take(500)}")
    if (code / 100 != 2)
      throw new RuntimeException(
        s"LLM HTTP $code: ${resp.body().take(500)}")
    val content = mapper.readTree(resp.body())
      .path("choices").path(0).path("message").path("content")
    if (content.isMissingNode)
      throw new RuntimeException(
        s"LLM response missing choices[0].message.content: ${resp.body().take(500)}")
    content.asText()
  }
}

/** Local-subprocess backend: pipes the prompt to a CLI binary's stdin and
  * returns its stdout — the serverless analog of the reference's LlamaCpp
  * branch (/root/reference/polarsai/__init__.py:183-188, dead code there),
  * for hosts that run `llama-cli` / a wrapper script directly instead of a
  * /chat/completions server (which HttpLlm already covers).
  *
  * One process per predict() call: completions are stateless in the ask
  * loop, and process spawn cost (~ms) is noise next to model inference.
  * The prompt travels on stdin, never argv — argv leaks into `ps` output
  * and has platform length limits; stdin has neither problem.
  */
final class ProcessLlm(
    command: Seq[String],
    timeoutSec: Long = 300,
    extraEnv: Map[String, String] = Map.empty) extends LlmClient {

  require(command.nonEmpty, "ProcessLlm needs a command to run")

  override def name: String = s"ProcessLlm(${command.head})"

  override def predict(prompt: String): String = {
    val pb = new ProcessBuilder(command: _*)
    extraEnv.foreach { case (k, v) => pb.environment().put(k, v) }
    val proc = pb.start()
    // Drain stdout/stderr — and feed stdin — on separate threads, all
    // BEFORE waitFor: a model that writes more than the ~64 KiB pipe
    // buffer would deadlock against our un-read pipe, and a prompt larger
    // than the buffer piped to a command that stalls before reading stdin
    // would block OUR thread on write() and never reach the timed waitFor.
    // On timeout the child is SIGKILLed via its handle; the broken pipes
    // then unblock all three (daemon) pipe threads.
    val out = pipeThread("stdout-reader",
      () => new String(proc.getInputStream.readAllBytes(), "UTF-8"))
    val err = pipeThread("stderr-reader",
      () => new String(proc.getErrorStream.readAllBytes(), "UTF-8"))
    pipeThread("stdin-writer", { () =>
      try {
        proc.getOutputStream.write(prompt.getBytes("UTF-8"))
        proc.getOutputStream.close()
      } catch {
        // A command that exits without reading stdin (or fails to launch
        // its model) closes the pipe early; the exit-code check below
        // gives the better diagnostic, so don't fail on the broken pipe.
        case _: java.io.IOException => ()
      }
      ""
    })
    // ONE deadline for the whole call: waitFor plus every pipe-drain get
    // shares it, so a caller-configured 300 s budget is a 300 s budget —
    // not 2× (exit at the wire, then a fresh window per get) or 3× on the
    // non-zero-exit path. (Post-exit drains get a small fixed grace — see
    // boundedGet — so the hard ceiling is timeoutSec + ~2 s.)
    //
    // The wait runs in ≤1 s slices, snapshotting the descendant set
    // before each: ProcessHandle.descendants() is EMPTY once the child
    // exits (orphans reparent to init), so a pipe-holding grandchild can
    // only be killed after the parent's exit if its handle was recorded
    // while the parent lived — the snapshot is at most one slice stale.
    val deadlineNanos = System.nanoTime() + timeoutSec * 1000000000L
    var tree: java.util.List[ProcessHandle] =
      java.util.Collections.emptyList[ProcessHandle]()
    var finished = false
    var expired = false
    while (!finished && !expired) {
      tree = proc.toHandle.descendants()
        .collect(java.util.stream.Collectors.toList[ProcessHandle]())
      finished = proc.waitFor(
        math.min(remainingNanos(deadlineNanos), 1000000000L),
        java.util.concurrent.TimeUnit.NANOSECONDS)
      expired = System.nanoTime() >= deadlineNanos
    }
    if (!finished) {
      // SIGKILL via the HANDLE, not Process.destroyForcibly: the latter
      // also closes stdin, whose stream monitor the write-blocked stdin
      // thread is holding — measured, that "destroy" blocks until the
      // child exits on its own (the full sleep in the regression test).
      // The raw-signal path takes no lock; the dying child breaks the
      // pipe, which is what actually unblocks the writer.
      killTree(proc, tree)
      throw new RuntimeException(
        s"ProcessLlm timed out after ${timeoutSec}s: ${command.head}")
    }
    // Bounded gets: the process exited, but a forked grandchild that
    // inherited the pipes can hold them open past the parent's exit —
    // without a deadline that would hang here despite the exit deadline
    // having been met.
    val stdout = boundedGet(out, proc, tree, deadlineNanos)
    if (proc.exitValue() != 0)
      throw new RuntimeException(
        s"ProcessLlm exit ${proc.exitValue()} from ${command.head}: " +
          boundedGet(err, proc, tree, deadlineNanos).take(500))
    stdout
  }

  /** Nanos left before `deadlineNanos`, floored at 1 ms so a just-expired
    * deadline still makes one non-blocking-ish attempt instead of passing
    * a zero/negative wait (which some waits treat as "forever").
    */
  private def remainingNanos(deadlineNanos: Long): Long =
    math.max(deadlineNanos - System.nanoTime(), 1000000L)

  /** SIGKILL the child AND its descendants — both the currently visible
    * ones and the snapshot recorded while the parent lived. `command` is
    * often a wrapper script that forks the actual model process — killing
    * only the direct child would leave the grandchild running inference
    * (and holding memory/GPU) indefinitely. After the parent's exit
    * descendants() returns nothing (orphans reparent to init), so the
    * recorded snapshot is the ONLY path to a pipe-holding orphan. */
  private def killTree(proc: Process,
      recorded: java.util.List[ProcessHandle]): Unit = {
    proc.toHandle.descendants().forEach(h => { h.destroyForcibly(); () })
    recorded.forEach(h => { if (h.isAlive) { h.destroyForcibly(); () } })
    proc.toHandle.destroyForcibly()
    ()
  }

  /** Post-exit drains get the REMAINING budget but never less than 1 s:
    * a child that exits just under the deadline with complete output must
    * not flip into a spurious "pipe still open" failure because the
    * reader thread lost a 1 ms race — the fixed grace bounds the whole
    * call at timeoutSec + ~2 s instead of re-arming a full window per
    * wait (the pre-r9 ~3× stretch). */
  private def boundedGet(f: java.util.concurrent.Future[String],
      proc: Process, tree: java.util.List[ProcessHandle],
      deadlineNanos: Long): String =
    try f.get(math.max(remainingNanos(deadlineNanos), 1000000000L),
      java.util.concurrent.TimeUnit.NANOSECONDS)
    catch {
      case _: java.util.concurrent.TimeoutException =>
        killTree(proc, tree)
        throw new RuntimeException(
          s"ProcessLlm output pipe still open at the ${timeoutSec}s " +
            s"deadline (grandchild holding stdout?): ${command.head}")
    }

  private def pipeThread(name: String,
      body: () => String): java.util.concurrent.Future[String] = {
    val task = new java.util.concurrent.FutureTask[String](() => body())
    val t = new Thread(task, s"graft-processllm-$name")
    t.setDaemon(true)
    t.start()
    task
  }
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
