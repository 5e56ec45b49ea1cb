package graft

import java.io.File
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Runtime discovery of every query-registry module on the classpath — the
  * single source of truth behind the orphan-module guard
  * (RegistryGuardSpec) and the generated operator catalog ([[CatalogGen]]).
  *
  * A "registry module" is any `graft.*` singleton object exposing
  * `all: Map[String, (SparkSession, String) => DataFrame]` (and optionally
  * `oracle: Map[String, String]`). The convention is discovered via the
  * compiled class files' generic signatures, not declared — a new module is
  * seen the moment it compiles, with no registration step to forget.
  */
object Registry {

  final case class Module(className: String, queries: Set[String],
      oracles: Set[String]) {
    /** `graft.warehouse.SkewAdvisor$` → `SkewAdvisor`. */
    def simpleName: String =
      className.stripSuffix("$").split('.').last
  }

  private def classesRoot: File = new File(
    SparkEntry.getClass.getProtectionDomain.getCodeSource.getLocation.toURI)

  /** All compiled `graft.**` object classes, loaded WITHOUT initialization
    * (only confirmed registry modules are ever initialized). The code
    * source is a CLASSES DIRECTORY under `sbt test` but a packaged JAR
    * under forked `sbt runMain` — both are walked.
    */
  private def moduleClasses: Seq[Class[_]] = {
    val root = classesRoot
    val names: Seq[String] =
      if (root.isFile && root.getName.endsWith(".jar")) {
        import scala.jdk.CollectionConverters._
        val jar = new java.util.jar.JarFile(root)
        try jar.entries().asScala.map(_.getName)
          .filter(n => n.startsWith("graft/") && n.endsWith("$.class"))
          .map(_.stripSuffix(".class").replace('/', '.')).toList
        finally jar.close()
      } else {
        def walk(f: File): Seq[File] =
          if (f.isDirectory) f.listFiles().toSeq.flatMap(walk)
          else if (f.getName.endsWith("$.class")) Seq(f) else Nil
        val base = root.toPath
        walk(new File(root, "graft")).map(f =>
          base.relativize(f.toPath).toString
            .stripSuffix(".class").replace(File.separatorChar, '.'))
      }
    names.flatMap { cls =>
      try Some(Class.forName(cls, false, getClass.getClassLoader))
      catch { case _: Throwable => None }
    }
  }

  /** The registry shape, recognized from the GENERIC method signature. */
  private def allMethod(c: Class[_]) =
    c.getMethods.find { m =>
      m.getName == "all" && m.getParameterCount == 0 &&
        classOf[scala.collection.immutable.Map[_, _]]
          .isAssignableFrom(m.getReturnType) &&
        m.getGenericReturnType.getTypeName.contains("scala.Function2") &&
        m.getGenericReturnType.getTypeName
          .contains("org.apache.spark.sql.SparkSession")
    }

  private def oracleMethod(c: Class[_]) =
    c.getMethods.find { m =>
      (m.getName == "oracle" || m.getName == "oracleSql") &&
        m.getParameterCount == 0 &&
        classOf[scala.collection.immutable.Map[_, _]]
          .isAssignableFrom(m.getReturnType) &&
        m.getGenericReturnType.getTypeName ==
          "scala.collection.immutable.Map<java.lang.String, java.lang.String>"
    }

  /** Every registry module with its query/oracle key sets. */
  def modules: Seq[Module] = moduleClasses
    .filter(_ != SparkEntry.getClass)
    .flatMap { c =>
      allMethod(c).map { m =>
        val inst = c.getField("MODULE$").get(null)
        val queries = m.invoke(inst)
          .asInstanceOf[Map[String, (SparkSession, String) => DataFrame]].keySet
        val oracles = oracleMethod(c).map(_.invoke(inst)
          .asInstanceOf[Map[String, String]].keySet).getOrElse(Set.empty)
        Module(c.getName, queries, oracles)
      }
    }
    .sortBy(_.className)
}
