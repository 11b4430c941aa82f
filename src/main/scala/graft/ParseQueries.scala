package graft

object ParseQueries {
  def all: Seq[(String, Q)] = Seq()
}
