package graft

object NorthStarQueries {
  def all: Seq[(String, Q)] = Seq()
}
