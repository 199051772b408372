package simspark
object Probe { def hello: String = "ok-" + org.apache.spark.SPARK_VERSION }
