package graft.model

/** Typed data model of the engine, mirroring the reference's object graph
  * (dataclasses at generate_lakefs_dbgap_xml_index.py:45-74 and the KGX
  * node/edge shapes at get_bdc_studies_from_gen3.py:258-352). Used as
  * `Dataset[T]` element types where the pipelines benefit from type safety;
  * the ops layer stays DataFrame-based for dynamic schemas.
  */

/** A coded categorical value ("1" -> "Male"). */
final case class Value(code: String, label: String)

/** A variable-level metadata record (VLMD row). */
final case class Variable(
    ddId: String,
    id: String,
    name: String,
    title: Option[String],
    description: Option[String],
    typ: Option[String],
    section: Option[String],
    logicalMin: Option[String],
    logicalMax: Option[String],
    values: Seq[Value])

/** A section/module/data-table grouping of variables. */
final case class Section(section: String, variables: Seq[Variable])

/** Study-level metadata (SLMD) with nested sections. */
final case class Study(
    repository: String,
    filepath: String,
    studyId: String,
    studyName: Option[String],
    studyDescription: Option[String],
    applId: Option[String],
    studyVersion: Option[String],
    sections: Seq[Section])

/** KGX property-graph node (biolink-flavored). */
final case class KgxNode(
    id: String,
    name: String,
    categories: Seq[String],
    description: Option[String],
    iri: Option[String],
    program: Option[String])

/** KGX edge: subject --predicate--> object. */
final case class KgxEdge(subject: String, predicate: String, `object`: String)
