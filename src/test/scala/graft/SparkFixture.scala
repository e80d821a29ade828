package graft

import org.apache.spark.sql.SparkSession

/** One shared local session per suite (guide: one SparkSession per suite);
  * configuration lives in [[Sessions]]. */
trait SparkFixture {
  lazy val spark: SparkSession = SparkFixture.session
}

object SparkFixture {
  lazy val session: SparkSession = Sessions.local("4", "graft-test")
}
