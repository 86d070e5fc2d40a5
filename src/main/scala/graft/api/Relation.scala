package graft.api

import org.apache.spark.sql.{Column, DataFrame}

/** Programmatic relation API — the reference's DataFrame-like entry point 2
  * (/root/reference integration/python/connection_environment/relation/
  * relation_factory.cpp:195-365: make_node_match/select/group/sort/join/
  * limit) as a thin typed facade. Each method declares a Catalyst logical
  * node; nothing executes until an action — identical deferred-execution
  * semantics to the reference's plan-building relation objects, with
  * Catalyst as the optimizer instead of its single optimizer pass.
  */
final case class Relation(df: DataFrame) {
  def filter(cond: Column): Relation = Relation(df.filter(cond))
  def select(cols: Column*): Relation = Relation(df.select(cols: _*))
  def project(names: String*): Relation =
    Relation(df.select(names.map(df.col): _*))
  def join(other: Relation, cond: Column,
           joinType: String = "inner"): Relation =
    Relation(df.join(other.df, cond, joinType))
  def crossJoin(other: Relation): Relation = Relation(df.crossJoin(other.df))
  def group(keys: Seq[Column], aggs: Seq[Column]): Relation =
    Relation(df.groupBy(keys: _*).agg(aggs.head, aggs.tail: _*))
  def order(cols: Column*): Relation = Relation(df.orderBy(cols: _*))
  def limit(n: Int): Relation = Relation(df.limit(n))
  def offset(n: Int): Relation = Relation(df.offset(n))
  def distinct: Relation = Relation(df.distinct())
  def union(other: Relation): Relation =
    Relation(df.union(other.df).distinct())
  def unionAll(other: Relation): Relation = Relation(df.union(other.df))
  def intersect(other: Relation): Relation =
    Relation(df.intersect(other.df))
  def except(other: Relation): Relation = Relation(df.except(other.df))

  def toDF: DataFrame = df
  def collectRows(): Array[org.apache.spark.sql.Row] = df.collect()
  def count(): Long = df.count()
}
