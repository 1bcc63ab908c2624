package graft.copy

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Config-surface parity with the reference factory
  * (reference/service/HdfsFileSystemFactoryTest.java:29-69): per-namespace
  * resource paths, memoization, distinct configs per namespace. Kerberos
  * login itself is untestable without a KDC (SURVEY.md §7.4) — only the
  * config-key surface is pinned.
  */
class FsFactorySpec extends AnyFunSuite with Matchers {

  test("configuration layers the namespace's core-site and hdfs-site") {
    val dir = java.nio.file.Files.createTempDirectory("conf")
    val ns = dir.resolve("prod"); java.nio.file.Files.createDirectories(ns)
    java.nio.file.Files.writeString(ns.resolve("core-site.xml"),
      """<?xml version="1.0"?><configuration>
        |<property><name>fs.defaultFS</name><value>hdfs://prod-nn:8020</value></property>
        |</configuration>""".stripMargin)
    java.nio.file.Files.writeString(ns.resolve("hdfs-site.xml"),
      """<?xml version="1.0"?><configuration>
        |<property><name>dfs.replication</name><value>2</value></property>
        |</configuration>""".stripMargin)
    val f = new FsFactory(dir.toString)
    val conf = f.configuration("prod")
    conf.get("fs.defaultFS") shouldBe "hdfs://prod-nn:8020"
    conf.get("dfs.replication") shouldBe "2"
  }

  test("secure mode sets kerberos auth + principal from system property") {
    val dir = java.nio.file.Files.createTempDirectory("conf")
    sys.props("kerberos.principal") = "svc@EXAMPLE.COM"
    try {
      val conf = new FsFactory(dir.toString, secure = true).configuration("ns")
      conf.get("hadoop.security.authentication") shouldBe "kerberos"
      conf.get("hadoop.kerberos.principal") shouldBe "svc@EXAMPLE.COM"
    } finally sys.props -= "kerberos.principal"
  }

  test("configurations are memoized per namespace and distinct across namespaces") {
    val dir = java.nio.file.Files.createTempDirectory("conf")
    val f = new FsFactory(dir.toString)
    (f.configuration("a") eq f.configuration("a")) shouldBe true
    (f.configuration("a") eq f.configuration("b")) shouldBe false
  }
}
