package graft.llm

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.Duration

import com.fasterxml.jackson.databind.ObjectMapper

/** Connection settings for an OpenAI-compatible chat-completions
  * endpoint (the wire protocol every reference client speaks —
  * `core/llm/QwenModel.py:71-100`). `temperature = 0` + a fixed `seed`
  * is the reproducible-generation posture; leave `seed` unset for
  * servers that reject the field.
  */
final case class LlmConfig(
    baseUrl: String,
    model: String,
    apiKey: String = "",
    temperature: Double = 0.0,
    seed: Option[Long] = None,
    maxTokens: Option[Int] = None,
    requestTimeout: Duration = Duration.ofSeconds(120),
    maxRetries: Int = 3,
    retryBaseMs: Long = 500L)

/** Real `LlmClient` over `java.net.http`: POSTs a chat-completions
  * request and returns `choices[0].message.content`.
  *
  * Per the port's north star this runs DRIVER-SIDE ONLY — never inside
  * a Spark plan (an executor-side HTTP fan-out would turn a 100 TB scan
  * into a DDoS of the inference tier). Actors receive it as the same
  * `LlmClient` trait they are tested against with `MockLlm`.
  *
  * Retry policy: 429 and 5xx responses (and transport errors) retry up
  * to `maxRetries` times with exponential backoff; a `Retry-After`
  * header, when present, overrides the computed delay. Other non-200
  * statuses fail fast — a 401/404 never heals by retrying.
  *
  * `sleeper` is injectable so specs exercise the backoff schedule
  * without wall-clock waits.
  */
final class HttpLlmClient(cfg: LlmConfig,
    sleeper: Long => Unit = Thread.sleep) extends LlmClient {

  private val http = HttpClient.newBuilder()
    .connectTimeout(Duration.ofSeconds(10))
    .build()
  private val mapper = new ObjectMapper()

  private val endpoint =
    URI.create(cfg.baseUrl.stripSuffix("/") + "/chat/completions")

  private def requestBody(prompt: String): String = {
    val body = mapper.createObjectNode()
    body.put("model", cfg.model)
    val msg = body.putArray("messages").addObject()
    msg.put("role", "user")
    msg.put("content", prompt)
    body.put("temperature", cfg.temperature)
    cfg.seed.foreach(body.put("seed", _))
    cfg.maxTokens.foreach(body.put("max_tokens", _))
    mapper.writeValueAsString(body)
  }

  private def parseContent(json: String): String = {
    val root = mapper.readTree(json)
    val content = root.path("choices").path(0).path("message").path("content")
    // explicit null content (tool-call / filtered responses) must fail,
    // not become the literal string "null" flowing into pred_sql
    require(!content.isMissingNode && !content.isNull,
      s"malformed chat-completions response (no choices[0].message.content): " +
        json.take(200))
    content.asText()
  }

  def complete(prompt: String): String = {
    val builder = HttpRequest.newBuilder(endpoint)
      .timeout(cfg.requestTimeout)
      .header("Content-Type", "application/json")
    if (cfg.apiKey.nonEmpty) builder.header("Authorization", s"Bearer ${cfg.apiKey}")
    val req = builder
      .POST(HttpRequest.BodyPublishers.ofString(requestBody(prompt)))
      .build()

    var attempt = 0
    var lastErr: String = ""
    while (attempt <= cfg.maxRetries) {
      val outcome: Either[String, Either[Long, String]] =
        try {
          val resp = http.send(req, HttpResponse.BodyHandlers.ofString())
          resp.statusCode() match {
            case 200 => Right(Right(resp.body()))
            case s if s == 429 || s >= 500 =>
              val retryAfterMs = Option(resp.headers().firstValue("Retry-After").orElse(null))
                .flatMap(v => scala.util.Try(v.trim.toLong * 1000L).toOption)
                .getOrElse(cfg.retryBaseMs << attempt)
              lastErr = s"HTTP $s: ${resp.body().take(200)}"
              Right(Left(retryAfterMs))
            case s =>
              Left(s"LLM endpoint $endpoint returned HTTP $s: ${resp.body().take(200)}")
          }
        } catch {
          case e: java.io.IOException =>
            lastErr = s"transport error: ${e.getMessage}"
            Right(Left(cfg.retryBaseMs << attempt))
        }
      outcome match {
        case Left(fatal) => throw new RuntimeException(fatal)
        case Right(Right(body)) => return parseContent(body)
        case Right(Left(delayMs)) =>
          attempt += 1
          if (attempt <= cfg.maxRetries) sleeper(delayMs)
      }
    }
    throw new RuntimeException(
      s"LLM endpoint $endpoint failed after ${cfg.maxRetries + 1} attempts; last: $lastErr")
  }
}
