package graft

/** Typed job configuration (operator S5, SURVEY §2.2): the environment
  * surface the reference loads in `load_env`
  * (`/root/reference/src/sql_to_kafka.py:36-55`) plus the document
  * pipeline's S3/XML keys (`/root/reference/.env.sample:1-74`,
  * `src/s3_json_to_xml.py`), as one case class with the reference's
  * defaults. CLI args override env, env overrides defaults — so the jobs
  * run with zero configuration and scale to a fully externalized deploy.
  *
  * Keys the reference uses only to provision its docker-compose stack
  * (zookeeper, broker listeners, Airflow, MinIO root credentials) are
  * intentionally out of scope: they configure the INFRASTRUCTURE, not the
  * job. The engine analog of `AWS_S3_ENDPOINT_URL`-style object-store
  * wiring is Hadoop s3a configuration (see [[graft.sources.Sources]]).
  */
case class GraftConfig(
  csvFilePath: String = "data/products.csv",
  outputXmlPath: String = "data/output.xml",
  kafkaBootstrapServers: String = "localhost:9092",
  kafkaTopic: String = "product-updates",
  kafkaAcks: String = "all",
  kafkaRetries: Int = 3,
  kafkaBatchSize: Int = 16384,
  kafkaLingerMs: Int = 1,
  kafkaBufferMemory: Long = 33554432L,
  defaultDaysBack: Int = 30,
  articleStatus: String = "created",
  s3Bucket: String = "delete-me",
  s3JsonKey: String = "sample_products.json",
  s3XmlKey: String = "output.xml",
  logLevel: String = "INFO",
  logBackupCount: Int = 7) {

  /** Producer options for `format("kafka")`, from the typed knobs —
    * the configurable form of
    * [[graft.sinks.KafkaSink.referenceProducerOptions]].
    */
  def producerOptions: Map[String, String] = Map(
    "kafka.bootstrap.servers" -> kafkaBootstrapServers,
    "kafka.acks" -> kafkaAcks,
    "kafka.retries" -> kafkaRetries.toString,
    "kafka.batch.size" -> kafkaBatchSize.toString,
    "kafka.linger.ms" -> kafkaLingerMs.toString,
    "kafka.buffer.memory" -> kafkaBufferMemory.toString,
    "kafka.enable.idempotence" -> "false")
}

object GraftConfig {

  /** Load from an environment map (reference env-var names, reference
    * defaults). Malformed numerics fail fast with the offending key —
    * the reference's bare `int(os.getenv(...))` crash, with a name.
    */
  def fromEnv(env: Map[String, String] = sys.env): GraftConfig = {
    def str(key: String, dflt: String): String = env.getOrElse(key, dflt)
    def int(key: String, dflt: Int): Int =
      env.get(key).map(v => v.toIntOption.getOrElse(
        throw new IllegalArgumentException(s"$key must be an integer, got '$v'")))
        .getOrElse(dflt)
    def long(key: String, dflt: Long): Long =
      env.get(key).map(v => v.toLongOption.getOrElse(
        throw new IllegalArgumentException(s"$key must be an integer, got '$v'")))
        .getOrElse(dflt)
    GraftConfig(
      csvFilePath = str("CSV_FILE_PATH", "data/products.csv"),
      outputXmlPath = str("OUTPUT_XML_PATH", "data/output.xml"),
      kafkaBootstrapServers = str("KAFKA_BOOTSTRAP_SERVERS", "localhost:9092"),
      kafkaTopic = str("KAFKA_TOPIC", "product-updates"),
      kafkaAcks = str("KAFKA_ACKS", "all"),
      kafkaRetries = int("KAFKA_RETRIES", 3),
      kafkaBatchSize = int("KAFKA_BATCH_SIZE", 16384),
      kafkaLingerMs = int("KAFKA_LINGER_MS", 1),
      kafkaBufferMemory = long("KAFKA_BUFFER_MEMORY", 33554432L),
      defaultDaysBack = int("DEFAULT_DAYS_BACK", 30),
      articleStatus = str("ARTICLE_STATUS", "created"),
      s3Bucket = str("S3_BUCKET", "delete-me"),
      s3JsonKey = str("S3_JSON_KEY", "sample_products.json"),
      s3XmlKey = str("S3_XML_KEY", "output.xml"),
      logLevel = str("LOG_LEVEL", "INFO"),
      logBackupCount = int("LOG_BACKUP_COUNT", 7))
  }
}
