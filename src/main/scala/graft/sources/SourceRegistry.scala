package graft.sources

/** A named [[Source]] factory — the SPI half of the reference's plugin
  * registry (meerschaum/plugins/__init__.py:539-1013 loads user modules and
  * resolves fetch plugins by short name; `mrsm.Pipe('plugin:stress', ...)`
  * names one). Implementations are discovered two ways:
  *
  *   - `java.util.ServiceLoader` over `META-INF/services/
  *     graft.sources.SourceProvider` — a jar on the classpath registers its
  *     sources by dropping in the services file, no code changes here;
  *   - [[SourceRegistry.register]] for programmatic/embedded registration.
  *
  * `config` carries the connector-string keyword arguments (the reference
  * passes plugin kwargs the same way). */
trait SourceProvider {
  def name: String
  def create(config: Map[String, String]): Source
}

object SourceRegistry {
  private val programmatic =
    scala.collection.concurrent.TrieMap.empty[String, SourceProvider]

  private lazy val loaded: Map[String, SourceProvider] = {
    import scala.jdk.CollectionConverters._
    java.util.ServiceLoader.load(classOf[SourceProvider],
        getClass.getClassLoader)
      .iterator().asScala
      .map(p => p.name.toLowerCase -> p).toMap
  }

  /** Register (or replace) a provider at runtime. */
  def register(p: SourceProvider): Unit = { programmatic.put(p.name.toLowerCase, p); () }

  def names: Seq[String] = (loaded.keySet ++ programmatic.keySet).toSeq.sorted

  /** Resolve a source by short name — programmatic registrations shadow
    * ServiceLoader ones. Unknown names fail listing what IS available. */
  def forName(name: String, config: Map[String, String] = Map.empty): Source = {
    val k = name.toLowerCase
    programmatic.get(k).orElse(loaded.get(k)).map(_.create(config)).getOrElse(
      throw new IllegalArgumentException(
        s"no source provider named '$name' (available: ${names.mkString(", ")})"))
  }
}

/** Registers the built-in [[StressSource]] under the reference's plugin
  * short name (`plugin:stress`). */
final class StressProvider extends SourceProvider {
  override def name = "stress"
  override def create(config: Map[String, String]): Source =
    new StressSource(
      rows = config.getOrElse("rows", "1440").toLong,
      numIds = config.getOrElse("ids", "3").toInt,
      seed = config.getOrElse("seed", "42").toLong)
}
