# SpiderStory-free (Llama3): the minimum end-to-end slice (SURVEY.md §7.1
# phase 3) — system prompt -> jitted LLM decode -> story-element parser ->
# consistent SDXL story generation. Mirrors the reference's
# train_configs/spider_story_free_llama3.py role.

model = dict(
    type="spider_decoder",
    name="spider_story_free",
    system_prompt=(
        "You are a story writer. For any user request, output exactly one "
        "story plan in this grammar: <IMAGESTORY><GENERALPROMPT>'main "
        "character and theme'</GENERALPROMPT>, <PROMPTARRAY>['scene 1', "
        "'scene 2', ...]</PROMPTARRAY>, <STYLENAME>'style'</STYLENAME>"
        "</IMAGESTORY>. STYLENAME is chosen from: ['Japanese Anime', "
        "'Digital/Oil Painting', 'Photographic', 'Comic book']."
    ),
    user_prompt="Create a story about an alien visiting Earth.",
    assistant_prompt="",
    max_context_len=1000,
)

story_generation = dict(
    model_name="Unstable",
    id_length=4,
    sa_ratio=0.5,
    num_inference_steps=50,
    height=768,
    width=768,
)
