package graft

import org.apache.spark.sql.functions._
import graft.engine._

/** The reference's examples-as-golden-tests (SURVEY.md §5.1 / FIXTURES.md A):
  * each shipped example hardcodes its expected answer — replayed here
  * against equivalent in-memory data through the full engine. */
class GoldenSpec extends SparkSpec {
  import spark.implicits._

  // A1 (loan payments, examples/from_csv.py:12-14): filter + count → 247.
  // Equivalent mini-fixture: same shape, deterministic expected count.
  test("A1: filter+count semantics (loans 'male AND PAIDOFF')") {
    val loans = Seq(
      ("xqd1", "PAIDOFF", "male"), ("xqd2", "PAIDOFF", "female"),
      ("xqd3", "COLLECTION", "male"), ("xqd4", "PAIDOFF", "male"),
      ("xqd5", "COLLECTION_PAIDOFF", "female"))
      .toDF("Loan_ID", "loan_status", "Gender")
    val llm = FakeLlm(
      "```sql\nSELECT count(*) AS n FROM df WHERE Gender = 'male' AND loan_status = 'PAIDOFF'\n```")
    val ans = new GraftSession(spark, llm)
      .ask(loans, "How many loans are from men and have been paid off?")
    assert(ans.text == "2")
  }

  // A2 (countries, examples/from_dataframe.py:13-15): filter + sum over an
  // is_in set → 20901884461056 with the reference's exact GDP figures.
  test("A2: sum of north american GDPs = 20901884461056") {
    val gdp = Seq(
      ("United States", 19294482071552L), ("United Kingdom", 2891615567872L),
      ("France", 2411255037952L), ("Germany", 3435817336832L),
      ("Italy", 1745433788416L), ("Spain", 1181205135360L),
      ("Canada", 1607402389504L), ("Australia", 1490967855104L),
      ("Japan", 4380756541440L), ("China", 14631844184064L))
      .toDF("country", "gdp")
    val llm = FakeLlm(
      "```sql\nSELECT sum(gdp) AS s FROM df WHERE country IN ('United States', 'Canada')\n```")
    val ans = new GraftSession(spark, llm)
      .ask(gdp, "Calculate the sum of the gdp of north american countries")
    assert(ans.text == "20901884461056")
  }

  // A3 (employees ⋈ salaries, examples/with_multiple_dataframes.py:7-27):
  // inner join + argmax(Salary) → "Olivia".
  test("A3: join + argmax → Olivia") {
    val employees = Seq(
      (1, "John", "HR"), (2, "Emma", "Sales"), (3, "Liam", "IT"),
      (4, "Olivia", "Marketing"), (5, "William", "Finance"))
      .toDF("EmployeeID", "Name", "Department")
    val salaries = Seq((1, 5000), (2, 6000), (3, 4500), (4, 7000), (5, 5500))
      .toDF("EmployeeID", "Salary")
    val llm = FakeLlm(
      "```sql\nSELECT Name FROM df1 JOIN df2 ON df1.EmployeeID = df2.EmployeeID ORDER BY Salary DESC LIMIT 1\n```")
    val ans = new GraftSession(spark, llm)
      .ask(Seq(employees, salaries), "Who gets paid the most?")
    assert(ans.text == "Olivia")
  }

  // A4 (fruits, examples/single_dataframe_example.py:4-9): sum(A) → 15.
  test("A4: fruits sum(A) = 15") {
    val fruits = Seq(
      (1, "banana", 5, "beetle"), (2, "banana", 4, "audi"),
      (3, "apple", 3, "beetle"), (4, "apple", 2, "audi"),
      (5, "banana", 1, "beetle")).toDF("A", "fruits", "B", "cars")
    val llm = FakeLlm("```sql\nSELECT CAST(sum(A) AS BIGINT) AS s FROM df\n```")
    assert(new GraftSession(spark, llm)
      .ask(fruits, "what is the sum of the A column?").text == "15")
  }
}
