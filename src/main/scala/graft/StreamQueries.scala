package graft

object StreamQueries {
  def all: Seq[(String, Q)] = Seq()
}
