"""Biolink vocabulary (closed): entity classes with their placeholders and
ontology prefixes, predicates, and the association definitions that drive
sentence extraction and classified-sentence storage.

Reference: .../etl/util/BiolinkConstants.java — placeholders :11-22,
BiolinkPredicate enum :167-187, BiolinkClass enum :214-227, the
BiolinkAssociation enum (association id + subject/object class + allowed
predicates, :57-160).

These are plain frozen dataclasses, consumed as arguments to
``operators.sentences.extract_sentences`` (prefix lists + placeholders) and
``operators.classified.classified_sentence_tables`` (association id,
subject placeholder, predicate columns of the classifier output).
"""

from __future__ import annotations

from dataclasses import dataclass

#: BERT-output column label for "no relation predicted"
NO_RELATION = "false"


@dataclass(frozen=True)
class BiolinkClass:
    name: str
    placeholder: str
    prefixes: tuple[str, ...]


DISEASE = BiolinkClass("DISEASE", "@DISEASE$", ("MONDO",))
DISEASE_OR_PHENOTYPIC_FEATURE = BiolinkClass(
    "DISEASE_OR_PHENOTYPIC_FEATURE", "@DISEASE$", ("MONDO", "HP")
)
PHENOTYPIC_FEATURE = BiolinkClass("PHENOTYPIC_FEATURE", "@PHENOTYPICFEATURE$", ("HP",))
CHEMICAL = BiolinkClass("CHEMICAL", "@CHEMICAL$", ("DRUGBANK", "CHEBI"))
BIOLOGICAL_PROCESS = BiolinkClass("BIOLOGICAL_PROCESS", "@PROCESS$", ("GO",))
ANATOMICAL_SITE = BiolinkClass("ANATOMICAL_SITE", "@SITE$", ("UBERON",))
CELLULAR_COMPONENT = BiolinkClass("CELLULAR_COMPONENT", "@COMPONENT$", ("GO",))
CELL_TYPE = BiolinkClass("CELL_TYPE", "@CELL$", ("CL",))
ANY_LOCATION = BiolinkClass("ANY_LOCATION", "@LOCATION$", ("UBERON", "CL", "GO"))
GENE = BiolinkClass("GENE", "@GENE$", ("PR",))
REGULATED_GENE = BiolinkClass("REGULATED_GENE", "@REGULATED_GENE$", ("PR",))
REGULATING_GENE = BiolinkClass("REGULATING_GENE", "@GENE_REGULATOR$", ("PR",))

#: predicate curie → BERT-output column label (BiolinkPredicate :167-187)
PREDICATES: dict[str, str] = {
    NO_RELATION: "false",
    "biolink:entity_positively_regulates_entity": "pos-reg",
    "biolink:entity_negatively_regulates_entity": "neg-reg",
    "biolink:treats": "treats",
    "biolink:expressed_in": "expressed_in",
    "biolink:contributes_to": "contributes_to",
    "biolink:loss_of_function_contributes_to": "contributes_to_via_loss_of_function",
    "biolink:gain_of_function_contributes_to": "contributes_to_via_gain_of_function",
    "biolink:has_phenotype": "has_phenotype",
    "biolink:occurs_in": "occurs_in",
    "biolink:actively_involved_in": "actively_involved_in",
    "biolink:participates_in": "participates_in",
    "biolink:located_in": "located_in",
}


@dataclass(frozen=True)
class BiolinkAssociation:
    association_id: str
    subject: BiolinkClass
    object: BiolinkClass
    #: predicate curies the classifier scores for this association,
    #: IN COLUMN ORDER (NO_RELATION last, as in the BERT output layout)
    predicates: tuple[str, ...]


ASSOCIATIONS: dict[str, BiolinkAssociation] = {
    a.association_id: a
    for a in [
        BiolinkAssociation(
            "biolink:ChemicalToDiseaseOrPhenotypicFeatureAssociation",
            CHEMICAL,
            DISEASE_OR_PHENOTYPIC_FEATURE,
            ("biolink:treats", "biolink:contributes_to", NO_RELATION),
        ),
        BiolinkAssociation(
            "biolink:ChemicalToGeneAssociation",
            CHEMICAL,
            GENE,
            (
                "biolink:entity_positively_regulates_entity",
                "biolink:entity_negatively_regulates_entity",
                NO_RELATION,
            ),
        ),
        BiolinkAssociation(
            "biolink:DiseaseToPhenotypicFeatureAssociation",
            DISEASE,
            PHENOTYPIC_FEATURE,
            ("biolink:has_phenotype", NO_RELATION),
        ),
        BiolinkAssociation(
            "biolink:GeneRegulatoryRelationship",
            REGULATING_GENE,
            REGULATED_GENE,
            (
                "biolink:entity_positively_regulates_entity",
                "biolink:entity_negatively_regulates_entity",
                NO_RELATION,
            ),
        ),
        BiolinkAssociation(
            "biolink:GeneToDiseaseAssociation",
            GENE,
            DISEASE_OR_PHENOTYPIC_FEATURE,
            ("biolink:contributes_to", NO_RELATION),
        ),
        BiolinkAssociation(
            "biolink:GeneToCellularComponentAssociation",
            GENE,
            CELLULAR_COMPONENT,
            ("biolink:located_in", NO_RELATION),
        ),
        BiolinkAssociation(
            "biolink:GeneToBiologicalProcessAssociation",
            GENE,
            BIOLOGICAL_PROCESS,
            ("biolink:participates_in", NO_RELATION),
        ),
        BiolinkAssociation(
            "biolink:BiologicalProcessToDiseaseOrPhenotypicFeatureAssociation",
            BIOLOGICAL_PROCESS,
            DISEASE_OR_PHENOTYPIC_FEATURE,
            ("biolink:occurs_in", NO_RELATION),
        ),
    ]
}


def extraction_args(association_id: str) -> dict:
    """Convenience: the extract_sentences kwargs for an association."""
    a = ASSOCIATIONS[association_id]
    return {
        "x_prefixes": list(a.subject.prefixes),
        "y_prefixes": list(a.object.prefixes),
        "x_placeholder": a.subject.placeholder,
        "y_placeholder": a.object.placeholder,
    }
