package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

package object queries {
  /** A driver-checkable query: (session, scale-factor dir) → result. */
  type Q = (SparkSession, String) => DataFrame
}
