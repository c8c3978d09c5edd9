package graft

import org.apache.spark.sql.functions._

import graft.functions.ChemFns

/** FIXTURES.md §B molecule fixture: coalesce-name fallback (P10,
  * /root/reference/chembl_to_molecule_type.py:20-26) and the F5
  * canonicalization check.
  */
class ChemFnsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val molecule = Seq(
    // (chembl_id, molecule_type, pref_name, dict_pref_name, canonical_smiles)
    ("CHEMBL25", "Small molecule", "ASPIRIN", "acetylsalicylic acid",
      "CC(=O)Oc1ccccc1C(=O)O"),
    ("CHEMBL112", "Small molecule", null, "PARACETAMOL",
      "CC(=O)Nc1ccc(O)cc1"),
    ("CHEMBL2007641", "Antibody", null, null, null),
    // non-canonical ring numbering — the fixpoint case
    ("CHEMBLX", "Small molecule", "TESTMOL", null, "C2CC2")
  ).toDF("chembl_id", "molecule_type", "pref_name", "dict_pref_name", "canonical_smiles")

  test("coalesce name fallback (P10)") {
    val names = molecule
      .select(col("chembl_id"), coalesce(col("pref_name"), col("dict_pref_name")).as("name"))
      .orderBy("chembl_id").as[(String, String)].collect().toMap
    assert(names("CHEMBL25") == "ASPIRIN")
    assert(names("CHEMBL112") == "PARACETAMOL")
    assert(names("CHEMBL2007641") == null)
  }

  test("canonical SMILES UDF: fixpoint + is_canonical flags") {
    val out = molecule.filter(col("canonical_smiles").isNotNull)
      .select(col("chembl_id"),
        ChemFns.canonicalSmiles(col("canonical_smiles")).as("canon"),
        ChemFns.isCanonical(col("canonical_smiles")).as("is_canon"))
      .orderBy("chembl_id").collect()
    val byId = out.map(r => r.getString(0) -> (r.getString(1), r.getBoolean(2))).toMap
    assert(byId("CHEMBL25")._2 && byId("CHEMBL112")._2)
    assert(!byId("CHEMBLX")._2 && byId("CHEMBLX")._1 == "C1CC1")
    // idempotence on the fixture
    val twice = molecule.filter(col("canonical_smiles").isNotNull)
      .select(ChemFns.canonicalSmiles(ChemFns.canonicalSmiles(col("canonical_smiles"))).as("c2"),
        ChemFns.canonicalSmiles(col("canonical_smiles")).as("c1"))
      .filter(col("c1") =!= col("c2")).count()
    assert(twice == 0)
  }
}
