package graft

object SkillQueries {
  def all: Seq[(String, Q)] = Seq()
}
