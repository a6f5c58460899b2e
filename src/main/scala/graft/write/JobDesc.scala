package graft.write

import org.apache.spark.sql.SparkSession

/** Job-description scoping (optimization guide §1.5 "label your jobs"):
  * multi-action operators (write → digest → footer → commit) submit many
  * anonymous jobs, which makes the UI — and any listener-based profile —
  * unreadable. `withDesc` labels every job an enclosed block submits and
  * restores the caller's own description afterwards (the property is
  * thread-local, so nesting works and concurrent driver threads don't
  * clobber each other). */
object JobDesc {
  def withDesc[T](spark: SparkSession, desc: String)(body: => T): T = {
    val sc = spark.sparkContext
    val prev = sc.getLocalProperty("spark.job.description")
    sc.setJobDescription(desc)
    try body
    finally sc.setJobDescription(prev)
  }
}
