package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

package object ops {
  /** Driver-contract query shape: (session, scale-factor dir) => result. */
  type Q = (SparkSession, String) => DataFrame
}
