package graft.operators
object StemProbe {
  def main(args: Array[String]): Unit = {
    import graft.surql.Snowball
    val out = new java.io.PrintWriter("/tmp/stems.txt", "UTF-8")
    def println(s: String): Unit = out.println(s)
    val ar = Seq("المدرسة","المعلمون","المعلمين","الكتب","المكتبة","الطلاب",
      "المدارس","السيارات","للمدرسة","بالمدرسة","كالقمر","والكتاب","فالحديقة",
      "وكتب","فذهب","كتابه","كتابها","كتابهم","كتابنا","كتابكم","كتابي",
      "سيارتها","مكتبة","جميلة","معلمات","مدرسات","كتبوا","ذهبوا","يكتبون",
      "تكتبين","كتبت","كتبنا","كتبتم","كتبتما","كتبها","كتبه","رأيتها",
      "سيكتب","سنذهب","ستكتبون","يستعمل","نستخدم","تستطيع","مستشفى","بنى",
      "أسماء","مؤمن","رئيس","الجامعة","العربية","والمدينة","قلم","باب",
      "كتاب","علم","درس")
    println("=== arabic ===")
    ar.foreach(w => println(s"$w -> ${Snowball.arabic(w)}"))
    val tr = Seq("evler","evleri","evlerim","evde","evden","evin","eve","evi",
      "evim","evimiz","kitaplar","kitabı","kitabım","kitapta","kitaptan",
      "arabalar","arabam","arabası","okulda","okuldan","okullar","gözlerim",
      "günler","yıllar","yılında","geldi","gelmiş","güzeldi","güzelmiş",
      "güzelse","iyiydi","evdeki","masadaki","sokakta","ağaçlar","çocuklar",
      "çocuğu","kelebeği","kanadı","soyadları","adlar","dolabı","şehirde",
      "paralar","sulardan","denizde","denizlerde","kitaplık","ellerinde",
      "gözlerinde","yollarda","kapıda","kapılar","annesi","babası","kardeşim",
      "öğrenciler","öğrencilerin","derslerde","sorular","cevaplar")
    println("=== turkish ===")
    tr.foreach(w => println(s"$w -> ${Snowball.turkish(w)}"))
    val ta = Seq("புத்தகங்கள்","கற்கள்","நாட்கள்","பூக்கள்","அவர்கள்","மரங்கள்",
      "வீடுகள்","கதைகள்","பறவைகள்","மரத்தில்","வீட்டில்","மரத்தின்","வீட்டின்",
      "அவனுடன்","அவளிடம்","மரத்தால்","அவனோடு","பள்ளியிலிருந்து","மரத்துக்கு",
      "புத்தகமும்","வீடும்","படிக்கிறான்","படிக்கிறாள்","படிக்கிறது",
      "படிக்கிறார்கள்","வந்தான்","வந்தாள்","வந்தது","மரத்தை","வீட்டை",
      "புத்தகமா","வருவானோ","அவனே",
      "இருந்தான்","இருந்தாள்","இருந்தது","மரத்திலிருந்து","வீட்டிலிருந்து",
      "பையனுடன்","பையனிடம்","பறவையோடு","குழந்தைகள்","மனிதர்கள்",
      "பெண்கள்","ஆண்கள்","மலைகள்","ஆறுகள்","நகரங்கள்","ஊர்கள்",
      "வீதியில்","கோயிலில்","மரத்துக்காக","செய்கிறான்","செய்கிறாள்",
      "சொல்கிறார்கள்","பார்க்கிறது","நூலகத்தில்")
    println("=== tamil ===")
    ta.foreach(w => println(s"$w -> ${Snowball.tamil(w)}"))
    out.close()
  }
}
